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
