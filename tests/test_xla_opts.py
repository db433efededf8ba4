"""xla_opts preset resolution + the trainers' jit path staying healthy with
the default preset on non-TPU backends (where the TPU flags must be elided).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.utils.xla_opts import (
    PRESETS, resolve_xla_opts)


def test_resolve_none_and_unknown():
    assert resolve_xla_opts("none", backend="tpu") is None
    with pytest.raises(ValueError):
        resolve_xla_opts("definitely_not_a_preset")


def test_tpu_only_flags_elided_off_tpu():
    # CPU/GPU compilers reject the TPU option names — the resolver must
    # return None (compiler defaults) there for every preset.
    for name in PRESETS:
        assert resolve_xla_opts(name, backend="cpu") is None
        assert resolve_xla_opts(name, backend="gpu") is None
    got = resolve_xla_opts("allsched", backend="tpu")
    assert got == {"xla_tpu_enable_all_experimental_scheduler_features": True}
    # a copy, not the shared preset dict
    got["x"] = 1
    assert "x" not in PRESETS["allsched"]


def test_default_config_has_preset():
    cfg = TGFRConfig()
    assert cfg.xla_opts in PRESETS
    # stage-2 defaults to compiler defaults: "allsched" measured slightly
    # negative on the fusion step (docs/BENCHMARKS.md XLA-opts table).
    assert cfg.xla_opts_stage2 in PRESETS


def test_stage1_train_step_runs_with_default_preset_on_cpu():
    # conftest forces the CPU backend; the default config carries
    # xla_opts="allsched" and the trainer must compile + step regardless.
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer

    args = TGFRConfig().replace(
        en_type="BERT", bert_type="groupvit", synthetic=True, batch_size=4,
        num_workers=0, max_epoch=1, num_classes=40)
    tr = Stage1Trainer(args)
    B = 4
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.normal(size=(B, 112, 112, 3)),
                           dtype=jnp.float32),
        "caps": jnp.asarray(rng.integers(1000, 20000, (B, 24)),
                            dtype=jnp.int32),
        "mask": jnp.ones((B, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 40, B), dtype=jnp.int32),
    }
    st = jax.tree_util.tree_map(jnp.array, tr.state)
    st, metrics = tr._train_step(st, batch, tr.backbone.variables,
                                 jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
