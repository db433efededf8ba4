"""Observability utilities: NaN guard, step timer, profiler gating."""

import numpy as np
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.utils.profiling import (
    StepTimer,
    maybe_profile,
    nan_guard,
)


def test_nan_guard_raises_on_nonfinite():
    nan_guard({"loss": 1.0, "aux": np.float32(2.0)}, step=3)  # fine
    with pytest.raises(FloatingPointError, match="idn_loss"):
        nan_guard({"idn_loss": float("nan")}, step=7)
    with pytest.raises(FloatingPointError):
        nan_guard({"loss": np.float32("inf")})


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert t.count == 3
    assert t.mean >= 0.0


def test_maybe_profile_noop_without_dir():
    args = TGFRConfig()
    with maybe_profile(args, 5):
        x = 1 + 1
    assert x == 2


def test_maybe_profile_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp
    args = TGFRConfig()
    args.extras.update(profile_dir=str(tmp_path), profile_start=1,
                       profile_steps=1)
    for step in range(3):
        with maybe_profile(args, step):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any(tmp_path.rglob("*.xplane.pb"))
