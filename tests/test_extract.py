"""Serving extraction (engine/extract.py).

Pins the two claims the serving layer makes:
1. mesh-sharded extraction == single-device extraction (sample batches
   padded over the 8-device CPU mesh, ragged final batch included). Keys,
   class ids, and shapes are exact; embedding VALUES agree to float32
   reduction-order tolerance (~5e-7): padding 12 -> 16 rows changes the
   GEMM tiling XLA picks, which reorders accumulations — unlike the eval
   metrics (rank-based, exact in test_eval_sharded.py), raw float vectors
   cannot promise bit-equality across batch partitionings;
2. the exported fused embeddings reproduce the eval loop's pair scores —
   cosine between two single-side embeddings (_embed_batch) is exactly
   _pair_scores (reference: utils/modules.py:104-151).
"""

import numpy as np

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import evaluate as ev
from text_guided_face_recognition_tpu.engine import prepare as prep
from text_guided_face_recognition_tpu.engine.extract import extract_embeddings


def _args(**kw):
    # batch 12 is not divisible by 8: every batch exercises the pad path
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=12, num_workers=2,
        compute_dtype="float32", num_classes=16, lstm_words_num=8,
        captions_per_image=2, manual_seed=0, fusion_type="linear",
        fusion_final_dim=640, is_ident=False, is_roc=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


def test_extract_sharded_matches_single_device(tmp_path):
    r1 = extract_embeddings(_args(num_devices=1), split="test")
    out = tmp_path / "emb.npz"
    r8 = extract_embeddings(_args(num_devices=8), split="test", out=str(out))

    assert r1["embeddings"].shape[0] == r1["keys"].shape[0] > 0
    assert r1["embeddings"].shape[1] == 640  # linear fusion dim
    np.testing.assert_array_equal(r1["keys"], r8["keys"])
    np.testing.assert_array_equal(r1["class_ids"], r8["class_ids"])
    # fp32 reduction-order tolerance (see module docstring)
    np.testing.assert_allclose(r1["embeddings"], r8["embeddings"],
                               rtol=1e-4, atol=2e-6)

    saved = np.load(out)
    np.testing.assert_array_equal(saved["embeddings"], r8["embeddings"])
    np.testing.assert_array_equal(saved["keys"], r8["keys"])


def test_pair_scores_equal_cosine_of_embeddings():
    """_pair_scores == cosine(_embed_batch(side1), _embed_batch(side2)) on
    the flagship fcfm-BERT path — the serving docstring's core claim."""
    args = _args(en_type="BERT", bert_type="groupvit", fusion_type="fcfm")
    test_dl, _ = prep.prepare_dataloader(args, "test")
    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)

    batch = next(iter(test_dl))
    common = (backbone.module, image_head.module, text_encoder.module,
              text_head.module, fusion_net.module, "BERT", args.model_type,
              "fcfm", backbone.variables, image_head.variables,
              text_encoder.variables["params"], text_head.variables["params"],
              fusion_net.variables)
    scores = ev._pair_scores(*common, batch["img1"], batch["img2"],
                             batch["cap1"], batch["cap2"],
                             batch["mask1"], batch["mask2"])
    e1 = ev._embed_batch(*common, batch["img1"], batch["cap1"], batch["mask1"])
    e2 = ev._embed_batch(*common, batch["img2"], batch["cap2"], batch["mask2"])
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(ev.cosine_pairs(e1, e2)),
                               rtol=1e-6, atol=1e-6)
