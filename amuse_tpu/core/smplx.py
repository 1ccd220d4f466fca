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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.core import rotations
from amuse_tpu.core.rotations import axis_angle_to_matrix

NUM_JOINTS = 55
NUM_BODY_BETAS = 300  # reference uses 300-beta MoSh shapes (latent_losses.py:192)

# The published SMPL-X kinematic tree (kintree_table row 0 of the released
# npz): pelvis-rooted body chain + jaw/eyes off the head + 15 finger joints
# per wrist (index/middle/pinky/ring/thumb, 3 links each). This is model
# STRUCTURE metadata (like the pose-vector layout above), used so synthetic
# rigs and benchmarks exercise the real tree: its depth is 10, not 54, which
# is what makes the level-scheduled FK below fast.
SMPLX_PARENTS = np.asarray(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 15, 15, 15,
     20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
     21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53],
    dtype=np.int32,
)


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


def make_test_model(
    num_vertices: int = 64,
    num_joints: int = 6,
    num_betas: int = 8,
    seed: int = 0,
    parents: np.ndarray | None = None,
) -> SmplxModel:
    """Synthetic rig for unit tests and benchmarks.

    Default skeleton is a simple chain; pass ``parents=SMPLX_PARENTS`` (with
    num_joints=55) to exercise the real released tree topology — benchmarks
    do, so FK timings reflect the depth-10 tree of the published model.
    """
    rng = np.random.default_rng(seed)
    v_template = rng.normal(size=(num_vertices, 3)).astype(np.float32)
    shapedirs = 0.01 * rng.normal(size=(num_vertices, 3, num_betas)).astype(np.float32)
    posedirs = 0.001 * rng.normal(size=((num_joints - 1) * 9, num_vertices * 3)).astype(np.float32)
    j_reg = rng.dirichlet(np.ones(num_vertices), size=num_joints).astype(np.float32)
    lbs = rng.dirichlet(np.ones(num_joints), size=num_vertices).astype(np.float32)
    if parents is None:
        parents = np.arange(-1, num_joints - 1, dtype=np.int32)
    else:
        parents = np.asarray(parents, np.int32)
        assert parents.shape[0] == num_joints, "parents table must match num_joints"
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


@functools.lru_cache(maxsize=16)
def _fk_schedule(parents_key: tuple) -> tuple:
    """Static level schedule for a parent table: joints grouped by tree depth.

    Returns (levels, level_parent_pos, pos) where joints are processed in
    depth-major order, ``levels[d]`` holds the original joint indices at
    depth d, ``level_parent_pos[d]`` their parents' positions in the
    depth-major ordering, and ``pos`` maps original index -> depth-major
    position. All host-side numpy: the schedule is a compile-time constant.
    """
    parents = np.asarray(parents_key)
    j = parents.shape[0]
    if j > 1 and not (parents[1:] < np.arange(1, j)).all():
        raise ValueError("kinematic tree must be topologically ordered (parents[i] < i)")
    depth = np.zeros(j, np.int64)
    for i in range(1, j):
        if parents[i] >= 0:
            depth[i] = depth[parents[i]] + 1
    order = np.argsort(depth, kind="stable")
    pos = np.empty(j, np.int64)
    pos[order] = np.arange(j)
    levels = [order[depth[order] == d] for d in range(int(depth.max()) + 1)]
    level_parent_pos = [None] + [pos[parents[idx]] for idx in levels[1:]]
    return tuple(map(tuple, levels)), tuple(
        None if p is None else tuple(p) for p in level_parent_pos
    ), tuple(pos)


def _rigid_transforms(rot_mats: jax.Array, joints: jax.Array, parents: np.ndarray):
    """Forward kinematics along the tree -> world transforms per joint.

    rot_mats (J, 3, 3), joints (J, 3) rest positions. Returns (posed_joints
    (J, 3), rel_transforms (J, 4, 4)) where rel_transforms maps rest-pose
    skinning space to world (the standard "A - A @ [j; 0]" form).

    TPU-first schedule: instead of 54 sequential 4x4 composes (the torch
    smplx loop — latency-bound, ~24 ms per monitor call at batch 9600), all
    joints at the same tree DEPTH compose in one batched (L,3,3) matmul.
    The published SMPL-X tree is depth 10, so the chain is 10 batched steps;
    rotations and translations compose separately (no homogeneous padding
    in the hot loop). Measured 3.3x on the full vertex-monitor leg.
    """
    parents = np.asarray(parents)
    j = joints.shape[0]
    rel_joints = joints - jnp.where(
        jnp.asarray((parents >= 0))[:, None], joints[np.maximum(parents, 0)], 0.0
    )
    levels, level_parent_pos, pos = _fk_schedule(tuple(int(p) for p in parents))
    # depth-major accumulation: concat-only (no scatters); parents always
    # live in the already-built prefix because depth(parent) < depth(child).
    r_cat = rot_mats[np.asarray(levels[0])]
    t_cat = rel_joints[np.asarray(levels[0])]
    for idx, par_pos in zip(levels[1:], level_parent_pos[1:]):
        idx = np.asarray(idx)
        rp = r_cat[np.asarray(par_pos)]  # (L, 3, 3) static gather
        tp = t_cat[np.asarray(par_pos)]
        r_cat = jnp.concatenate([r_cat, rp @ rot_mats[idx]])
        t_cat = jnp.concatenate(
            [t_cat, jnp.einsum("lab,lb->la", rp, rel_joints[idx]) + tp]
        )
    inv = np.asarray(pos)
    world_rot = r_cat[inv]  # (J, 3, 3) back to joint order
    posed_joints = t_cat[inv]  # (J, 3)
    # remove rest-pose joint location contribution for skinning
    correction = jnp.einsum("jab,jb->ja", world_rot, joints)
    rel = (
        jnp.zeros((j, 4, 4), rot_mats.dtype)
        .at[:, :3, :3].set(world_rot)
        .at[:, :3, 3].set(posed_joints - correction)
        .at[:, 3, 3].set(1.0)
    )
    return posed_joints, rel


class SocTables(NamedTuple):
    """Component-major ("structure of slabs") tables for the high-throughput
    monitor forward :func:`soc_monitor_vertices`.

    Motivation (measured, v5e): the per-frame :func:`forward` vmapped over
    B*T=9600 frames materialises (N, V, 3) / (N, 55, 3, 3) intermediates
    between XLA fusions. TPU tiles the two MINOR dims as (8, 128), so a
    trailing (3, 3) pads ~40x in HBM - the full vertex-monitor leg measured
    ~80 ms regardless of vertex count, with the FLOP content worth ~3 ms.
    In slab form every device tensor is 2D with the LARGE axis (V or J)
    last: blend shapes and skinning become clean MXU matmuls, rotation
    algebra becomes VPU elementwise on (N, J) slabs, and nothing with a
    size-3 trailing dim ever hits HBM. Same math, same model tensors.
    """

    v_template_c: tuple  # 3 x (V,)
    shapedirs_c: tuple  # 3 x (K, V)
    posedirs_cm: jax.Array  # (9*(J-1), 3V): rows component-major (k, then
    # joint); columns component-major (all x | all y | all z) - ONE matmul
    lbs_weights_p: jax.Array  # (J, V), rows in FK depth-major joint order
    j_template_c: tuple  # 3 x (J,)
    j_shapedirs_c: tuple  # 3 x (K, J)


def prepare_soc(model: SmplxModel) -> SocTables:
    """Host-side one-time reorganisation of the model tensors into slabs.

    Every device table is its own 2D array (tuples, not a stacked 3D array:
    slices of a 3D closed-over constant inherit its layout, which XLA picks
    for the 3D shape, not for the matmul - measured 8x slower).
    """
    v = model.num_vertices
    j = model.num_joints
    sd = np.asarray(model.shapedirs)  # (V, 3, K)
    pd = np.asarray(model.posedirs)  # ((J-1)*9, V*3), rows joint-major
    # rows -> component-major (k in 0..8 outer, joint inner) so the pose
    # feature can be built as a concat of nine 2D slabs
    pd_km = pd.reshape(j - 1, 9, v, 3).transpose(1, 0, 2, 3)  # (9, J-1, V, 3)
    jt = (
        np.asarray(model.j_template)
        if model.j_template is not None
        else np.asarray(model.j_regressor) @ np.asarray(model.v_template)
    )
    jsh = (
        np.asarray(model.j_shapedirs)
        if model.j_shapedirs is not None
        else np.einsum("jv,vck->jck", np.asarray(model.j_regressor), sd)
    )
    levels, _, _ = _fk_schedule(tuple(int(p) for p in np.asarray(model.parents)))
    order = np.concatenate([np.asarray(lv) for lv in levels])
    return SocTables(
        v_template_c=tuple(jnp.asarray(np.asarray(model.v_template)[:, c]) for c in range(3)),
        shapedirs_c=tuple(jnp.asarray(sd[:, c, :].T) for c in range(3)),
        posedirs_cm=jnp.asarray(
            np.concatenate(
                [pd_km[..., c].reshape(9 * (j - 1), v) for c in range(3)], axis=1
            )
        ),
        lbs_weights_p=jnp.asarray(np.asarray(model.lbs_weights).T[order]),
        j_template_c=tuple(jnp.asarray(jt[:, c]) for c in range(3)),
        j_shapedirs_c=tuple(jnp.asarray(jsh[:, c, :].T) for c in range(3)),
    )


def _fk_slabs(r9: tuple, t3: list, parents) -> tuple[list, list, list]:
    """Level-scheduled FK on component slabs.

    r9: 9 rotation-component arrays (N, J) row-major; t3: 3 rest-joint
    component arrays (N, J). Returns (posed_joints3, rel_rot9, rel_t3), all
    (N, J) slabs in DEPTH-MAJOR joint order (consume with permuted tables,
    e.g. SocTables.lbs_weights_p).
    """
    parents = np.asarray(parents)
    par = np.maximum(parents, 0)
    has_p = jnp.asarray(parents >= 0)[None, :]
    relj = [t - jnp.where(has_p, t[:, par], 0.0) for t in t3]
    levels, level_parent_pos, _ = _fk_schedule(tuple(int(p) for p in parents))
    root = np.asarray(levels[0])
    rw = [c[:, root] for c in r9]
    tw = [c[:, root] for c in relj]
    for idx, ppos in zip(levels[1:], level_parent_pos[1:]):
        idx = np.asarray(idx)
        ppos = np.asarray(ppos)
        rp = [c[:, ppos] for c in rw]
        tp = [c[:, ppos] for c in tw]
        rl = [c[:, idx] for c in r9]
        tl = [c[:, idx] for c in relj]
        new_r = [
            rp[3 * a] * rl[b] + rp[3 * a + 1] * rl[3 + b] + rp[3 * a + 2] * rl[6 + b]
            for a in range(3)
            for b in range(3)
        ]
        new_t = [
            rp[3 * a] * tl[0] + rp[3 * a + 1] * tl[1] + rp[3 * a + 2] * tl[2] + tp[a]
            for a in range(3)
        ]
        rw = [jnp.concatenate([c, n], axis=1) for c, n in zip(rw, new_r)]
        tw = [jnp.concatenate([c, n], axis=1) for c, n in zip(tw, new_t)]
    # skinning form: rel_t = t_world - R_world @ j_rest  (depth-major order)
    order = np.concatenate([np.asarray(lv) for lv in levels])
    jd = [c[:, order] for c in t3]
    rel_t = [
        tw[a] - (rw[3 * a] * jd[0] + rw[3 * a + 1] * jd[1] + rw[3 * a + 2] * jd[2])
        for a in range(3)
    ]
    return tw, rw, rel_t


def soc_monitor_vertices(
    model: SmplxModel,
    soc: SocTables,
    feats6d: jax.Array,  # (B, T, joints*6 + 3) 6D motion feats
    betas: jax.Array,  # (B, n_betas), constant per window
) -> jax.Array:
    """(B, T, F) 6D windows -> posed vertices as a (3, B*T, V) slab stack.

    The vertex-monitor hot path (train/gesture.py): numerically equivalent
    to ``forward_batch`` over the flattened frames (tests/test_smplx.py
    pins the parity) but ~10x faster at flagship scale - see SocTables.
    Feeding 6D directly also skips the reference's 6D->axis-angle->matrix
    round-trip (exact same rotation; trainer.py:413-430 converts through
    axis-angle only because torch smplx wants axis-angle input).
    """
    b, t, f = feats6d.shape
    j = model.num_joints
    n = b * t
    mj = (f - 3) // 6
    d6 = feats6d[..., : mj * 6].reshape(n, mj, 6)[:, :j]
    r9 = rotations.rotation_6d_to_matrix_slabs(tuple(d6[..., k] for k in range(6)))
    trans = feats6d[..., -3:].reshape(n, 3)

    # betas are per-window: compute the shape correction at B rows, then
    # broadcast to frames (the per-frame path re-did this 300x per window)
    k_dim = soc.shapedirs_c[0].shape[0]
    nb = min(betas.shape[-1], k_dim)
    cb = betas[:, :nb]
    if nb < k_dim:
        cb = jnp.pad(cb, ((0, 0), (0, k_dim - nb)))

    def per_window_to_frames(x):  # (B, M) -> (N, M)
        return jnp.broadcast_to(x[:, None, :], (b, t, x.shape[-1])).reshape(n, -1)

    vsh = [
        per_window_to_frames(soc.v_template_c[c][None, :] + cb @ soc.shapedirs_c[c])
        for c in range(3)
    ]  # 3 x (N, V)
    jrest = [
        per_window_to_frames(soc.j_template_c[c][None, :] + cb @ soc.j_shapedirs_c[c])
        for c in range(3)
    ]  # 3 x (N, J)

    # pose-corrective features (R - I for joints 1..J-1), k-major concat;
    # ONE (N, 486) @ (486, 3V) matmul covers all three components.
    # optimization_barrier: without it XLA fuses the producer chains (GS /
    # FK slab algebra) INTO the matmuls' operands and recomputes them per
    # MXU tile - measured 474 -> 93 ms on the full-mesh 3-pass monitor leg.
    pf = jax.lax.optimization_barrier(
        jnp.concatenate(
            [r9[k][:, 1:] - (1.0 if k in (0, 4, 8) else 0.0) for k in range(9)],
            axis=1,
        )
    )  # (N, 9*(J-1))
    v = soc.lbs_weights_p.shape[1]
    pose_corr = pf @ soc.posedirs_cm  # (N, 3V)
    vp = jax.lax.optimization_barrier(
        tuple(vsh[c] + pose_corr[:, c * v : (c + 1) * v] for c in range(3))
    )  # 3 x (N, V)

    pj, rel_r, rel_t = _fk_slabs(r9, jrest, model.parents)
    rel_r = jax.lax.optimization_barrier(tuple(rel_r))
    rel_t = jax.lax.optimization_barrier(tuple(rel_t))
    w = soc.lbs_weights_p  # (J, V) depth-major rows: matches rel_* order
    outs = []
    for a in range(3):
        acc = rel_t[a] @ w
        for bb in range(3):
            acc = acc + (rel_r[3 * a + bb] @ w) * vp[bb]
        outs.append(acc + trans[:, a][:, None])
    return jnp.stack(outs)  # (3, N, V)


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
