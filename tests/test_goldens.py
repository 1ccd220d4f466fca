"""Golden-file regression: numerical outputs recorded at framework v0.1.

Locks the Kaldi fbank, rotation conversions, and scheduler tables against
accidental drift during refactors (the golden npz was produced by the same
code the parity tests validated against torch/diffusers semantics).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from amuse_tpu.audio import fbank as fb
from amuse_tpu.core import rotations as R
from amuse_tpu.diffusion import ddim_timesteps, make_schedule

GOLDEN = Path(__file__).parent / "goldens" / "golden_v1.npz"


def test_goldens():
    d = np.load(GOLDEN)
    out = np.asarray(fb.fbank(jnp.asarray(d["wave"])))
    np.testing.assert_allclose(out, d["fbank"], atol=1e-4)

    d6 = np.asarray(R.axis_angle_to_rotation_6d(jnp.asarray(d["aa"])))
    np.testing.assert_allclose(d6, d["d6"], atol=1e-6)

    s = make_schedule()
    np.testing.assert_allclose(np.asarray(s.betas), d["betas"], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), d["acp"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ddim_timesteps(s)), d["ddim_ts"])
