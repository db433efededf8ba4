import textwrap
import warnings

import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig, load_yaml


def test_defaults_match_reference_train_bert():
    cfg = TGFRConfig()
    assert cfg.aux_feat_dim_per_granularity == 256
    assert cfg.bert_words_num == 24
    assert cfg.num_classes == 4500
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 4.0
    assert cfg.TRAIN.SMOOTH.GAMMA2 == 5.0
    assert cfg.TRAIN.SMOOTH.GAMMA3 == 10.0
    assert cfg.fusion_final_dim == 640


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(textwrap.dedent(
        """
        batch_size: 64
        en_type: LSTM
        lstm_words_num: 18
        TRAIN:
            FLAG: True
            SMOOTH:
                GAMMA1: 4.0
                GAMMA2: 5.0
                GAMMA3: 10.0
        custom_extra_knob: 7
        """
    ))
    cfg = load_yaml(str(p))
    assert cfg.batch_size == 64
    assert cfg.en_type == "LSTM"
    assert cfg.custom_extra_knob == 7  # extras stay attribute-accessible


def test_malformed_float_coerced_with_warning(tmp_path):
    # reference cfg/train_bert.yml:35 ships `min_lr_bert: 0.00002)` — a string
    # that crashes torch Adam in the reference; we coerce with a warning.
    p = tmp_path / "cfg.yml"
    p.write_text("min_lr_bert: 0.00002)\n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_yaml(str(p))
    assert cfg.min_lr_bert == pytest.approx(2e-5)
    assert any("min_lr_bert" in str(x.message) for x in w)


def test_bad_type_fails_fast(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("batch_size: not_a_number\n")
    with pytest.raises(TypeError, match="batch_size"):
        load_yaml(str(p))


def test_reference_cfg_files_load():
    for name in ("train_bert", "train_lstm", "fusion_bert", "fusion_lstm", "test"):
        cfg = load_yaml(f"cfg/{name}.yml")
        assert cfg.num_classes == 4500


def test_celeba_cfg_variants_load():
    """cfg/*_celeba.yml (the reference ships celeba prep scripts but no
    config; tools/celeba_prep/ outputs wire into these)."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tr = load_yaml(os.path.join(root, "cfg", "train_bert_celeba.yml"))
    assert tr.dataset_name == "celeba"
    assert tr.captions_per_image == 1  # CelebA-Dialog: 1 caption/image
    assert tr.num_classes == 4500      # prep step 3 default train split
    te = load_yaml(os.path.join(root, "cfg", "test_celeba.yml"))
    assert te.test_sub == 1217         # prep step 3 test identities
    assert te.fusion_type == "fcfm"


def test_enum_fields_validated_at_construction():
    """A typo in a closed string enum must fail loudly (ADVICE r3): e.g.
    fused_block='towre' used to pass every gate and silently run unfused."""
    from text_guided_face_recognition_tpu.config import TGFRConfig
    with pytest.raises(ValueError, match="fused_block"):
        TGFRConfig().replace(fused_block="towre")
    with pytest.raises(ValueError, match="prng_impl"):
        TGFRConfig().replace(prng_impl="rgb")
    with pytest.raises(ValueError, match="adam_moments_dtype"):
        TGFRConfig().replace(adam_moments_dtype="fp16")
    # valid values still construct
    TGFRConfig().replace(fused_block="tower", prng_impl="threefry2x32")


def test_production_cfg_variants_load():
    """cfg/train_bert_b64.yml / cfg/fusion_bert_b128.yml: the measured
    production batches (docs/BENCHMARKS.md) with sqrt-rescaled LRs."""
    tr = load_yaml("cfg/train_bert_b64.yml")
    assert tr.batch_size == 64
    assert tr.init_lr_bert == pytest.approx(1e-4)
    assert tr.min_lr_bert == pytest.approx(2.8e-5)
    assert tr.lr_head == pytest.approx(1.4e-3)
    fu = load_yaml("cfg/fusion_bert_b128.yml")
    assert fu.batch_size == 128
    assert fu.lr_image_train == pytest.approx(0.28)
    assert fu.lr_head == pytest.approx(2.8e-3)
