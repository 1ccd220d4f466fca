"""SMPL-X body model (shape blendshapes + pose correctives + LBS) in JAX.

The reference calls the ``smplx`` package's body model for its
vertex-displacement loss - in float64, every training step
(models/latent_diffusion/utils/latent_losses.py:174-250) - and for
FK-based metrics. Here the forward is a pure function over a
:class:`SmplxModel` pytree of arrays, so it jits/vmaps/shards and runs in
float32 on the MXU (f32 vs the reference's f64 agrees to ~1e-5 m on
centimetre-scale vertices; validated in tests/test_smplx.py).

Model data layout matches the published SMPL-X npz artefacts
(v_template, shapedirs, posedirs, J_regressor, lbs_weights/weights,
kintree_table/parents). Those files ship with SMPL-X licensing and are NOT
bundled; load them with :func:`load_model`. All math below is the standard
published SMPL formulation.

SMPL-X pose vector layout used throughout (latent_losses.py:237-250):
  [0:3]    global_orient     [3:66]  body (21 joints)
  [66:69]  jaw               [69:75] eyes
  [75:120] left hand         [120:165] right hand      -> 55 joints total
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.core.rotations import axis_angle_to_matrix

NUM_JOINTS = 55
NUM_BODY_BETAS = 300  # reference uses 300-beta MoSh shapes (latent_losses.py:192)


class SmplxModel(NamedTuple):
    """Static model tensors (a pytree of jnp arrays, safe to close over in jit)."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, n_betas + n_expr)
    posedirs: jax.Array  # (54*9, V*3)
    j_regressor: jax.Array  # (J, V)
    lbs_weights: jax.Array  # (V, J)
    parents: np.ndarray  # (J,) host-side int32, parents[0] == -1 (STATIC:
    # the kinematic tree is compile-time constant, so FK unrolls at trace
    # time; keep models closed over in jitted functions, not passed as args)
    # Analytic joint tables (the J_regressor folded through the template and
    # shape basis): joints_rest = j_template + j_shapedirs . coeffs, exactly
    # equal to j_regressor @ v_shaped by linearity. REQUIRED when the vertex
    # set is subsampled (j_regressor spans the full mesh); optional otherwise.
    j_template: jax.Array | None = None  # (J, 3)
    j_shapedirs: jax.Array | None = None  # (J, 3, n_coeffs)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


def load_model(path, num_betas: int = NUM_BODY_BETAS, num_expr: int = 10) -> SmplxModel:
    """Load a published SMPLX_{NEUTRAL,MALE,FEMALE}.npz into a SmplxModel.

    ``shapedirs`` in the npz is (V, 3, 400) = 300 shape + 100 expression for
    the MoSh-compatible models; we keep ``num_betas`` shape dirs and
    ``num_expr`` expression dirs concatenated, mirroring how the reference
    instantiates smplx.create(num_betas=300, num_expression_coeffs=10).
    """
    d = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(d["shapedirs"], np.float32)
    total = shapedirs.shape[-1]
    if total > NUM_BODY_BETAS:
        # SMPL-X layout: dims [0, 300) are shape, [300, 400) are expression;
        # smplx.create uses shapedirs[:, :, 300:300+num_expr] - slicing the
        # LAST num_expr would pick expression basis 90-99 instead of 0-9
        n_shape = min(num_betas, NUM_BODY_BETAS)
        expr = shapedirs[..., NUM_BODY_BETAS : NUM_BODY_BETAS + num_expr]
        dirs = np.concatenate([shapedirs[..., :n_shape], expr], axis=-1)
    else:
        dirs = shapedirs[..., : min(num_betas, total)]
    posedirs = np.asarray(d["posedirs"], np.float32)
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    weights_key = "lbs_weights" if "lbs_weights" in d else "weights"
    parents = np.asarray(d["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    return SmplxModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(dirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(d[weights_key], jnp.float32),
        parents=parents.astype(np.int32),
    )


def make_test_model(num_vertices: int = 64, num_joints: int = 6, num_betas: int = 8, seed: int = 0) -> SmplxModel:
    """Tiny synthetic rig with a simple chain skeleton, for unit tests only."""
    rng = np.random.default_rng(seed)
    v_template = rng.normal(size=(num_vertices, 3)).astype(np.float32)
    shapedirs = 0.01 * rng.normal(size=(num_vertices, 3, num_betas)).astype(np.float32)
    posedirs = 0.001 * rng.normal(size=((num_joints - 1) * 9, num_vertices * 3)).astype(np.float32)
    j_reg = rng.dirichlet(np.ones(num_vertices), size=num_joints).astype(np.float32)
    lbs = rng.dirichlet(np.ones(num_joints), size=num_vertices).astype(np.float32)
    parents = np.arange(-1, num_joints - 1, dtype=np.int32)
    return SmplxModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(lbs),
        parents=parents,
    )


def subsample_vertices(model: SmplxModel, n: int, seed: int = 0) -> SmplxModel:
    """A model whose vertex set is a fixed random subset of ``n`` vertices.

    Per-vertex outputs are EXACT: each vertex's LBS depends only on its own
    template/shape/pose rows and the joint transforms, and the joints are
    regressed through the analytically folded ``j_template``/``j_shapedirs``
    tables (identical to ``j_regressor @ v_shaped`` by linearity). So the
    subsampled forward returns exactly ``full_forward(...)["vertices"][idx]``
    — the vertex-displacement monitor (train/gesture.py) becomes an unbiased
    mean over n of 10475 vertices at ~V/n of the LBS cost. Joints/FK are
    unchanged (eval metrics unaffected).

    The subset is deterministic in ``seed`` so monitor values are comparable
    across steps and restarts.
    """
    V = model.num_vertices
    if n >= V:
        return model
    idx = np.sort(np.random.default_rng(seed).choice(V, size=n, replace=False))
    j_template = (
        model.j_template
        if model.j_template is not None
        else model.j_regressor @ model.v_template
    )
    j_shapedirs = (
        model.j_shapedirs
        if model.j_shapedirs is not None
        else jnp.einsum("jv,vck->jck", model.j_regressor, model.shapedirs)
    )
    posedirs = model.posedirs.reshape(model.posedirs.shape[0], V, 3)
    return SmplxModel(
        v_template=model.v_template[idx],
        shapedirs=model.shapedirs[idx],
        posedirs=posedirs[:, idx].reshape(model.posedirs.shape[0], -1),
        j_regressor=model.j_regressor[:, idx],  # shape-consistent; unused
        lbs_weights=model.lbs_weights[idx],
        parents=model.parents,
        j_template=j_template,
        j_shapedirs=j_shapedirs,
    )


def _rigid_transforms(rot_mats: jax.Array, joints: jax.Array, parents: np.ndarray):
    """Forward kinematics along the tree -> world transforms per joint.

    rot_mats (J, 3, 3), joints (J, 3) rest positions. Returns (posed_joints
    (J, 3), rel_transforms (J, 4, 4)) where rel_transforms maps rest-pose
    skinning space to world (the standard "A - A @ [j; 0]" form).

    The kinematic chain is a scan-free loop over a static parent table: J=55
    iterations unrolled at trace time; XLA fuses this into a handful of
    kernels and it is a negligible cost next to the blend-shape matmuls.
    """
    parents = np.asarray(parents)
    rel_joints = joints - jnp.where(
        jnp.asarray((parents >= 0))[:, None], joints[np.maximum(parents, 0)], 0.0
    )
    # local homogeneous transforms
    locals_rot = rot_mats  # (J, 3, 3)
    transforms = [None] * joints.shape[0]
    transforms[0] = jnp.concatenate(
        [
            jnp.concatenate([locals_rot[0], rel_joints[0][:, None]], axis=1),
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype),
        ],
        axis=0,
    )
    for j in range(1, joints.shape[0]):
        local = jnp.concatenate(
            [
                jnp.concatenate([locals_rot[j], rel_joints[j][:, None]], axis=1),
                jnp.asarray([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype),
            ],
            axis=0,
        )
        parent = transforms[int(parents[j])]
        transforms[j] = parent @ local
    world = jnp.stack(transforms)  # (J, 4, 4)
    posed_joints = world[:, :3, 3]
    # remove rest-pose joint location contribution for skinning
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[:, :1])], axis=-1)
    correction = jnp.einsum("jab,jb->ja", world, joints_h)  # (J, 4)
    rel = world.at[:, :, 3].add(-correction)
    return posed_joints, rel


def forward(
    model: SmplxModel,
    poses: jax.Array,  # (J*3,) axis-angle, 55 joints
    betas: jax.Array,  # (n_betas,)
    transl: jax.Array,  # (3,)
    expression: jax.Array | None = None,  # (n_expr,)
    return_vertices: bool = True,
):
    """Single-frame SMPL-X forward -> dict(vertices (V,3), joints (J,3)).

    vmap over leading axes for batched frames; see :func:`forward_batch`.
    """
    n_joints = model.num_joints
    coeff_dim = model.shapedirs.shape[-1]
    expr = (
        jnp.zeros((max(coeff_dim - betas.shape[0], 0),), betas.dtype)
        if expression is None
        else expression
    )
    coeffs = jnp.concatenate([betas, expr])[:coeff_dim]
    if coeffs.shape[0] < coeff_dim:  # zero-pad any remaining coefficient dims
        coeffs = jnp.pad(coeffs, (0, coeff_dim - coeffs.shape[0]))

    v_shaped = model.v_template + jnp.einsum("vck,k->vc", model.shapedirs, coeffs)
    if model.j_template is not None:
        # folded regressor: exact, and the only valid path on a
        # vertex-subsampled model (j_regressor spans the full mesh)
        joints_rest = model.j_template + jnp.einsum(
            "jck,k->jc", model.j_shapedirs, coeffs
        )
    else:
        joints_rest = model.j_regressor @ v_shaped  # (J, 3)

    rot_mats = axis_angle_to_matrix(poses.reshape(n_joints, 3))
    if return_vertices:
        eye = jnp.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[1:] - eye).reshape(-1)  # (54*9,)
        v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(v_shaped.shape)
    else:
        v_posed = v_shaped

    posed_joints, rel = _rigid_transforms(rot_mats, joints_rest, model.parents)

    out = {"joints": posed_joints + transl}
    if return_vertices:
        skin_t = jnp.einsum("vj,jab->vab", model.lbs_weights, rel)  # (V, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], axis=-1)
        verts = jnp.einsum("vab,vb->va", skin_t, v_h)[:, :3]
        out["vertices"] = verts + transl
    return out


def forward_batch(model, poses, betas, transl, expression=None, return_vertices=True):
    """Batched frames: poses (N, 165), betas (N, B), transl (N, 3),
    expression None | (E,) shared | (N, E) per-frame."""
    if expression is not None and expression.ndim == 2:
        fn = lambda p, b, t, e: forward(model, p, b, t, e, return_vertices)  # noqa: E731
        return jax.vmap(fn)(poses, betas, transl, expression)
    fn = lambda p, b, t: forward(model, p, b, t, expression, return_vertices)  # noqa: E731
    return jax.vmap(fn)(poses, betas, transl)
