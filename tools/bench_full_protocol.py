"""Full-scale reference eval protocol on the live chip (VERDICT r4 #1).

The reference protocol is 1,193 test subjects x (1 genuine + 299 imposter)
pairs = 357,900 pair scores with rank-1 identification over the 300-wide
per-subject groups (reference: cfg/test.yml:15 `test_sub: 1193`,
data/face2text/scripts/test_list_identification.py:5-38,
utils/modules.py:76-88). Every eval evidence point before r5 was toy-scale;
this tool runs the protocol at its REAL size:

  * corpus: the real test-split metadata when the staged caption corpus is
    present (caption_assets/face2text: 1,193 subjects / 3,643 samples, real
    captions), otherwise a deterministic synthetic corpus at the exact same
    shape — images are synthetic either way (not redistributable).
  * pair list: built exactly like the reference script (per subject: anchor
    vs its second image genuine, + N seeded imposter draws), written as the
    reference's `img1 img2 label` lines.
  * table mode: the full 357,900 pairs via the deduplicated embedding table
    (engine/evaluate._table_score_loop) + identification at test_sub=1193.
  * pair mode: a bounded slice (default 8 subjects = 2,400 pairs) of the
    SAME list through the reference-semantics pair loop, timed to give the
    measured per-pair rate -> extrapolated full-protocol pair wall -> the
    measured table/pair crossover (replacing the r4 "~100-300x" estimate).

Emits JSON lines; `full_protocol_eval_wall_s` is the driver-facing metric
(bench.py runs this module for its fifth line).

Usage:
  python tools/bench_full_protocol.py                # full protocol
  python tools/bench_full_protocol.py --skip-pair    # table mode only
  python tools/bench_full_protocol.py --subjects 64 --imposters 29  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import resource
import sys
import tempfile
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

STAGED = os.path.join(ROOT, "caption_assets", "face2text")


def _protocol_names(n_subjects: int):
    """Test-split sample names: the real staged pickle when present (and big
    enough), else the same <id>/<id>_<k> shape synthesized."""
    path = os.path.join(STAGED, "test", "filenames.pickle")
    if os.path.isfile(path):
        with open(path, "rb") as f:
            names = list(pickle.load(f))
        by_id = defaultdict(list)
        for n in names:
            by_id[n.split("/")[0]].append(n)
        if len(by_id) >= n_subjects:
            keep = sorted(by_id, key=lambda s: int(s))[:n_subjects]
            return [n for i in keep for n in sorted(by_id[i])], True
    return [f"{5000 + s}/{5000 + s}_{k}"
            for s in range(n_subjects) for k in (1, 2, 3)], False


def _build_pair_list(names, n_imposters: int, out_path: str, seed=100):
    """Reference pair-list construction (behavior of
    data/face2text/scripts/test_list_identification.py:5-38; same algorithm
    as tools/face2text_prep/test_list_identification.py but fed from split
    metadata instead of an on-disk image tree): per subject one genuine pair
    + seeded imposter draws, `img1 img2 label` lines of bare names."""
    rng = random.Random(seed)
    by_id = defaultdict(list)
    for n in names:
        by_id[n.split("/")[0]].append(os.path.basename(n) + ".jpg")
    idents = sorted(by_id, key=lambda s: int(s) if s.isdigit() else s)
    lines = []
    n_emitted = 0
    for i, ident in enumerate(idents):
        mine = sorted(by_id[ident],
                      key=lambda x: int(x.split(".")[0].split("_")[-1]))
        if len(mine) < 2:
            continue
        n_emitted += 1
        anchor = mine[0]
        lines.append(f"{anchor} {mine[1]} 1")
        # reference: imposters are the FIRST n_imposters OTHER subjects in
        # sorted order (current subject popped), one random image each —
        # only the image draw is random, not the subject sequence
        others = idents[:i] + idents[i + 1:]
        for o in others[:n_imposters]:
            lines.append(f"{anchor} {rng.choice(by_id[o])} 0")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    # test_sub must count only subjects that EMITTED a pair group: a
    # single-image subject contributes zero lines, and counting it would
    # shift calculate_identification_acc's (test_sub, pairs_each) reshape
    # off every subsequent group
    return len(lines), n_emitted


def _make_dataset(args, names, use_real):
    """TestDataset over the protocol corpus: real captions when staged
    (tokenized through data/tokenizers.get_bert_tokenizer with the STAGED
    corpus as data_dir, so the offline chain reaches the corpus-trained
    WordPiece vocab rather than falling to HashTokenizer), synthetic token
    ids otherwise; images synthetic either way."""
    import numpy as np
    from text_guided_face_recognition_tpu.data.datasets import (
        TestDataset, _read_caption_file)
    from text_guided_face_recognition_tpu.data.tokenizers import (
        get_bert_tokenizer)

    caps, masks = [], []
    if use_real:
        encode = get_bert_tokenizer(args.replace(data_dir=STAGED))
        for name in names:
            got, first = 0, len(caps)
            for cap in _read_caption_file(STAGED, name):
                ids, m = encode(cap, args.bert_words_num)
                caps.append(ids)
                masks.append(m)
                got += 1
                if got == args.captions_per_image:
                    break
            if got == 0:
                raise ValueError(
                    f"staged corpus has no captions for {name!r} "
                    f"({STAGED}/text/{name}.txt is empty)")
            while got < args.captions_per_image:  # replicate own first
                caps.append(caps[first])
                masks.append(masks[first])
                got += 1
    else:
        rng = np.random.default_rng(0)
        for _ in range(len(names) * args.captions_per_image):
            n_tok = int(rng.integers(6, args.bert_words_num))
            ids = np.zeros(args.bert_words_num, np.int32)
            ids[0], ids[1:n_tok - 1], ids[n_tok - 1] = (
                101, rng.integers(1000, 30000, n_tok - 2), 102)
            m = np.zeros(args.bert_words_num, np.int32)
            m[:n_tok] = 1
            caps.append(ids)
            masks.append(m)
    return TestDataset(names, caps, masks, args=args, split="test",
                       synthetic=True)


def _slice_ds(ds, n_pairs: int):
    import copy
    sub = copy.copy(ds)
    sub.imgs_pair = ds.imgs_pair[:n_pairs]
    sub.pair_label = ds.pair_label[:n_pairs]
    return sub


def run(n_subjects=1193, n_imposters=299, batch_size=256, pair_slice=2400,
        skip_pair=False, out=print):
    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.data.loader import DataLoader
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.engine.evaluate import run_test

    names, use_real = _protocol_names(n_subjects)
    tmpdir = tempfile.mkdtemp(prefix="tgfr_protocol_")
    pair_list = os.path.join(tmpdir, f"test_{n_imposters}_sub.txt")
    n_pairs, n_sub = _build_pair_list(names, n_imposters, pair_list)

    args = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", synthetic=True,
        batch_size=batch_size, num_workers=4, compute_dtype="bfloat16",
        fusion_type="fcfm", fusion_final_dim=640, num_classes=4500,
        is_ident=True, is_roc=False, test_sub=n_sub,
        test_pair_list=pair_list, checkpoints_path=tmpdir)

    ds = _make_dataset(args, names, use_real)
    assert len(ds) == n_pairs
    te, th = prep.prepare_text_encoder(args)
    bb = prep.prepare_backbone(args)
    ih = prep.prepare_image_head(args)
    fu = prep.prepare_fusion_net(args)
    distinct = {s[0] for i in range(len(ds)) for s in ds.pair_sides(i)}

    # ---- table mode: the FULL protocol -------------------------------
    targs = args.replace(eval_table_mode=True)
    dl = DataLoader(ds, batch_size=batch_size, shuffle=False,
                    drop_last=False, num_workers=args.num_workers)
    t0 = time.perf_counter()
    metrics = run_test(targs, dl, bb, ih, fu, te, th)
    table_wall = time.perf_counter() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    out(json.dumps({
        "metric": "full_protocol_eval_wall_s",
        "value": round(table_wall, 2), "unit": "s (table mode, end-to-end)",
        "pairs": n_pairs, "subjects": n_sub,
        "distinct_sides": len(distinct),
        "pairs_per_sec": round(n_pairs / table_wall, 1),
        "identification_executed": bool(args.is_ident),
        "auc": round(float(metrics["auc"]), 4),
        "real_captions": use_real,
        "peak_host_rss_mb": round(peak_mb, 1),
    }))

    if skip_pair:
        return table_wall, None, metrics

    # ---- pair mode: bounded slice, measured rate -> extrapolation ----
    n_slice = min(pair_slice, n_pairs)
    sds = _slice_ds(ds, n_slice)
    sdl = DataLoader(sds, batch_size=batch_size, shuffle=False,
                     drop_last=False, num_workers=args.num_workers)
    pargs = args.replace(is_ident=False)
    t0 = time.perf_counter()
    run_test(pargs, sdl, bb, ih, fu, te, th)
    pair_wall = time.perf_counter() - t0
    full_pair_est = pair_wall / n_slice * n_pairs
    out(json.dumps({
        "metric": "full_protocol_pair_mode_slice",
        "value": round(pair_wall, 2), "unit": f"s for {n_slice} pairs",
        "pairs_per_sec": round(n_slice / pair_wall, 1),
        "extrapolated_full_protocol_s": round(full_pair_est, 1),
        "measured_table_speedup_x": round(full_pair_est / table_wall, 1),
    }))
    return table_wall, pair_wall, metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=1193)
    ap.add_argument("--imposters", type=int, default=299)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--pair-slice", type=int, default=2400)
    ap.add_argument("--skip-pair", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    # cpu_policy="off": CPU AOT cache entries can SIGILL across virtualized
    # host identities (utils/cache.py docstring); TPU keeps the tunnel cache
    enable_compile_cache(cpu_policy="off")
    run(a.subjects, a.imposters, a.batch, a.pair_slice, a.skip_pair)


if __name__ == "__main__":
    main()
