"""Reproducibility: identical config + seed -> identical initialization and
identical first-step losses across independent trainer instantiations (the
documented seeding scheme — SURVEY.md §7 hard part 5)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.config import TGFRConfig


def _args():
    return TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=4, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=7)


def test_same_seed_reproduces_first_step():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer

    losses = []
    for _ in range(2):
        tr = Stage1Trainer(_args())
        batch = {k: v for k, v in next(iter(tr.train_dl)).items()
                 if k != "key"}
        _, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(tr.args.manual_seed))
        losses.append({k: float(v) for k, v in metrics.items()})
    assert losses[0] == losses[1]


def test_different_seed_differs():
    """Classifier inits differ under a different manual_seed."""
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer

    tr1 = Stage1Trainer(_args())
    tr2 = Stage1Trainer(_args().replace(manual_seed=8))
    a = jax.tree_util.tree_leaves(tr1.state.params["image_cls"])[0]
    b = jax.tree_util.tree_leaves(tr2.state.params["image_cls"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
