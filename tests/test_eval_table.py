"""Table-mode evaluation (`eval_table_mode`, engine/evaluate._table_score_loop).

Pins the mode's claims:
1. BERT path (fully deterministic captions): table-mode pair scores equal
   pair-mode scores to float tolerance — the table computes the identical
   cosine(embed(a), embed(b)) math with each distinct side embedded once.
2. The dedup is real: the synthetic pair list references far fewer distinct
   sides than 2x pairs.
3. Mesh-sharded table == single-device table (8-device CPU mesh).
4. End-to-end run_test dispatch under the flag, both fusion paths, with
   metrics matching pair mode.
LSTM captions longer than lstm_words_num draw their subsample crop from a
per-PAIR rng in pair mode but a per-SAMPLE canonical rng in table mode
(DEVIATIONS #23) — so LSTM exactness is only asserted for pairs whose sides
are within the cap.
"""

import numpy as np

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import evaluate as ev
from text_guided_face_recognition_tpu.engine import prepare as prep


def _args(**kw):
    base = dict(
        en_type="BERT", bert_type="groupvit", synthetic=True, batch_size=12,
        num_workers=2, compute_dtype="float32", num_classes=16,
        captions_per_image=2, manual_seed=0, fusion_type="fcfm",
        fusion_final_dim=640, is_ident=False, is_roc=False,
        lstm_words_num=8)
    base.update(kw)
    return TGFRConfig().replace(**base)


def _bundles(args):
    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)
    return text_encoder, text_head, backbone, image_head, fusion_net


def _loops(args):
    """(pair_preds, table_preds, labels_pair, labels_table, ds) computed
    from the same bundles — run_test's own internals on both paths."""
    test_dl, test_ds = prep.prepare_dataloader(args, "test")
    args.vocab_size = test_ds.n_words
    te, th, bb, ih, fu = _bundles(args)
    mesh = ev.eval_mesh(args)
    te_p = ev._replicate_tree(te.variables["params"], mesh)
    th_mod = th.module if th is not None else None
    th_p = ev._replicate_tree(
        th.variables["params"] if th is not None else {}, mesh)
    fu_mod = fu.module if fu is not None else None
    fu_v = ev._replicate_tree(fu.variables if fu is not None else {}, mesh)
    bb_v = ev._replicate_tree(bb.variables, mesh)
    ih_v = ev._replicate_tree(ih.variables, mesh)
    common = (bb.module, ih.module, te.module, th_mod, fu_mod,
              args.en_type, args.model_type, args.fusion_type,
              bb_v, ih_v, te_p, th_p, fu_v)

    def fwd(i1, i2, c1, c2, x1, x2):
        return ev._pair_scores(*common, i1, i2, c1, c2, x1, x2)

    def embed(img, caps, extra):
        return ev._embed_batch(*common, img, caps, extra)

    pair_preds, pair_labels = ev._score_loop(args, test_dl, fwd, mesh)
    tab_preds, tab_labels = ev._table_score_loop(args, test_ds, embed, mesh)
    return pair_preds, tab_preds, pair_labels, tab_labels, test_ds


def test_table_scores_match_pair_scores_bert():
    pair, tab, lp, lt, ds = _loops(_args(num_devices=1))
    assert lp == lt and len(pair) == len(tab) == len(ds)
    np.testing.assert_allclose(pair, tab, rtol=1e-4, atol=2e-5)
    # the dedup is real: far fewer distinct sides than 2x pairs
    distinct = {k for i in range(len(ds)) for _, k in ds.pair_sides(i)}
    assert len(distinct) < len(ds)  # synthetic list: 64 distinct, 256 pairs


def test_table_mode_sharded_matches_single_device():
    a1, a8 = _args(num_devices=1), _args(num_devices=8)
    _, tab1, _, l1, _ = _loops(a1)
    _, tab8, _, l8, _ = _loops(a8)
    assert l1 == l8
    np.testing.assert_allclose(tab1, tab8, rtol=1e-4, atol=2e-5)


def test_run_test_dispatches_table_mode(capsys):
    args_p = _args(num_devices=1)
    test_dl, test_ds = prep.prepare_dataloader(args_p, "test")
    args_p.vocab_size = test_ds.n_words
    te, th, bb, ih, fu = _bundles(args_p)
    m_pair = ev.run_test(args_p, test_dl, bb, ih, fu, te, th)

    args_t = _args(num_devices=1, eval_table_mode=True)
    args_t.vocab_size = test_ds.n_words
    m_table = ev.run_test(args_t, test_dl, bb, ih, fu, te, th)
    assert m_pair.keys() == m_table.keys()
    for k in m_pair:
        np.testing.assert_allclose(m_pair[k], m_table[k], rtol=1e-4,
                                   atol=1e-4, err_msg=f"metric {k}")


def test_org_face_table_mode_matches():
    args_p = _args(num_devices=1)
    test_dl, test_ds = prep.prepare_dataloader(args_p, "test")
    args_p.vocab_size = test_ds.n_words
    bb = prep.prepare_backbone(args_p)
    m_pair = ev.org_face_test(args_p, test_dl, bb)
    args_t = _args(num_devices=1, eval_table_mode=True)
    args_t.vocab_size = test_ds.n_words
    m_table = ev.org_face_test(args_t, test_dl, bb)
    for k in m_pair:
        np.testing.assert_allclose(m_pair[k], m_table[k], rtol=1e-4,
                                   atol=1e-4, err_msg=f"metric {k}")


def test_validate_concat_table_mode_matches():
    """Stage-1 in-training validation (concat cosine) under the flag."""
    args_p = _args(num_devices=1, fusion_type="concat")
    valid_dl, valid_ds = prep.prepare_dataloader(args_p, "valid")
    args_p.vocab_size = valid_ds.n_words
    te, th, bb, ih, _ = _bundles(args_p)
    common = (bb, ih.module, ih.variables["params"],
              ih.variables.get("batch_stats", {}), te.module,
              te.variables["params"], th.module, th.variables["params"])
    m_pair = ev.validate_concat(args_p, valid_dl, *common)
    args_t = _args(num_devices=1, fusion_type="concat", eval_table_mode=True)
    args_t.vocab_size = valid_ds.n_words
    m_table = ev.validate_concat(args_t, valid_dl, *common)
    for k in m_pair:
        np.testing.assert_allclose(m_pair[k], m_table[k], rtol=1e-4,
                                   atol=1e-4, err_msg=f"metric {k}")


def test_table_mode_bf16_metric_parity():
    """The shipped cfg/test.yml default is bfloat16: table mode computes the
    pair cosine host-side in fp32 from bf16-computed embeddings while pair
    mode computes it on-device in compute_dtype, so raw scores may differ at
    bf16 scale. The mode's claim under bf16 is METRIC-level equivalence
    (ADVICE r4): AUC/EER/summed-score agreement, plus bf16-scale raw-score
    closeness."""
    from text_guided_face_recognition_tpu.utils.metrics import (
        calculate_scores)
    args = _args(num_devices=1, compute_dtype="bfloat16")
    pair, tab, lp, lt, _ = _loops(args)
    assert lp == lt
    np.testing.assert_allclose(pair, tab, atol=0.02)  # bf16-scale scores
    m_pair = calculate_scores(pair, lp, args)
    m_tab = calculate_scores(tab, lt, args)
    assert abs(m_pair["auc"] - m_tab["auc"]) <= 0.02
    assert abs(m_pair["eer"] - m_tab["eer"]) <= 0.02


def test_table_dedup_keys_on_full_name():
    """Two pair-list entries differing only by extension share a caption key
    but are distinct images — each must get its own table row (ADVICE r4:
    dedup on name[:-4] would collapse them, first-seen image winning)."""

    class StubDS:
        pair_label = [1, 0]

        def __len__(self):
            return 2

        def pair_sides(self, i):
            # a.jpg vs a.png: same caption key "a", different images
            return ([("a.jpg", "a"), ("b.jpg", "b")] if i == 0 else
                    [("a.png", "a"), ("b.jpg", "b")])

        def get_sample(self, name, key, need_caption=True):
            v = {"a.jpg": 1.0, "a.png": 2.0, "b.jpg": 3.0}[name]
            s = {"img": np.full((4,), v, np.float32)}
            if need_caption:
                s["cap"] = np.zeros((3,), np.int32)
                s["mask"] = np.ones((3,), np.int32)
            return s

    seen_rows = []

    def embed(img, caps, extra):
        seen_rows.append(np.asarray(img))
        return np.asarray(img)  # identity embed: rows = img values

    args = _args(num_devices=1, batch_size=8)
    preds, labels = ev._table_score_loop(args, StubDS(), embed, mesh=None)
    stacked = np.concatenate(seen_rows)[:, 0]
    assert {1.0, 2.0, 3.0} <= set(stacked.tolist())  # 3 distinct rows
    assert labels == [1, 0]
    assert preds[0] == preds[1] == 1.0  # identical-direction stub vectors


def test_lstm_table_matches_for_within_cap_captions():
    """LSTM: pairs whose BOTH captions fit lstm_words_num are crop-free and
    must match pair mode; over-long captions legitimately diverge
    (per-pair vs per-sample crop rng, DEVIATIONS #23)."""
    args = _args(en_type="LSTM", fusion_type="linear", num_devices=1)
    pair, tab, _, _, ds = _loops(args)

    def within_cap(key):
        ix = ds._index.get(key, 0) * ds.embeddings_num
        return len(ds.captions[ix]) <= ds.word_num

    exact = [i for i in range(len(ds))
             if all(within_cap(k) for _, k in ds.pair_sides(i))]
    assert exact, "synthetic list should contain some within-cap pairs"
    np.testing.assert_allclose(np.asarray(pair)[exact],
                               np.asarray(tab)[exact],
                               rtol=1e-4, atol=2e-5)
