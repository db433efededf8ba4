"""Checkpoint retention: prune_checkpoints keeps the newest K epochs of each
artifact family and never touches non-matching entries."""

import os

from text_guided_face_recognition_tpu.engine.checkpoint import (
    prune_checkpoints,
)


def _mk(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    (d / "x").write_text("1")


def test_prune_keeps_newest_per_family(tmp_path):
    for e in (1, 2, 3, 10):
        _mk(tmp_path, f"arcface_image_encoder_{e}")
        _mk(tmp_path, f"train_state_{e}")
    _mk(tmp_path, "not_an_epoch_dir")
    (tmp_path / "loose_file_3").write_text("keep me")  # file, not dir

    prune_checkpoints(str(tmp_path), keep_last=2)
    left = sorted(os.listdir(tmp_path))
    assert "arcface_image_encoder_3" in left
    assert "arcface_image_encoder_10" in left
    assert "arcface_image_encoder_1" not in left
    assert "train_state_10" in left and "train_state_3" in left
    assert "train_state_1" not in left
    assert "not_an_epoch_dir" in left  # no epoch suffix: untouched
    assert "loose_file_3" in left      # plain file: untouched


def test_prune_disabled_keeps_all(tmp_path):
    for e in (1, 2):
        _mk(tmp_path, f"train_state_{e}")
    prune_checkpoints(str(tmp_path), keep_last=0)
    assert len(os.listdir(tmp_path)) == 2
