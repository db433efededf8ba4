"""End-to-end stage-1 throughput WITH the real input pipeline (r3, VERDICT #4).

Every other benchmark number uses synthetic device-resident batches; this one
generates a real JPEG corpus once (PIL-encoded 160x160 images + caption txt +
filenames/class_info pickles in the exact Face2Text layout the loaders read),
then measures three rates for the flagship stage-1 BERT config:

  1. loader_only     — images/s of DataLoader + native decode/augment alone
                       (no device work; the host-side ceiling on this machine)
  2. compute_only    — pairs/s of the jitted step on device-resident batches
                       (utils/benching.py chained-marginal; the device ceiling)
  3. end_to_end      — pairs/s of the REAL `Stage1Trainer.train_epoch`:
                       loader -> prefetch_to_device -> async jitted steps,
                       one metrics sync per epoch.

Tunnel caveat (this machine): train_epoch dispatches steps through the axon
RPC tunnel at ~15 ms/dispatch, so end_to_end here is bounded by
min(loader_only, batch/0.015s) REGARDLESS of compute speed — on a real
TPU-VM host the dispatch cost is ~10 us and the bound is
min(loader_only * cores, compute_only). Both bounds are printed so the
host-bound gap is quantified explicitly (docs/BENCHMARKS.md).

Usage: python tools/bench_e2e_pipeline.py [--images 2048] [--batch 32]
                                          [--corpus DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

CAPTIONS = [
    "a young woman with long blonde hair and a wide smile",
    "the man has a beard a big nose and bushy eyebrows",
    "she is wearing glasses and has wavy brown hair",
    "an older person with gray hair high cheekbones and thin lips",
]


def build_corpus(root: str, n_train: int, n_eval: int = 64,
                 img_px: int = 160, num_classes: int = 4500) -> None:
    """Face2Text-layout corpus: images/<split>/<key>.jpg, text/<key>.txt,
    <split>/{filenames,class_info}.pickle (SURVEY.md §2.11 layout)."""
    import numpy as np
    from PIL import Image

    done_marker = os.path.join(root, f".complete_{n_train}_{n_eval}")
    if os.path.exists(done_marker):
        return
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "text"), exist_ok=True)
    for split, n in (("train", n_train), ("valid", n_eval), ("test", n_eval)):
        img_dir = os.path.join(root, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, split), exist_ok=True)
        names, classes = [], []
        for i in range(n):
            key = f"{split}_{i:06d}"
            arr = rng.integers(0, 256, (img_px, img_px, 3), dtype="uint8")
            Image.fromarray(arr).save(os.path.join(img_dir, key + ".jpg"),
                                      quality=85)
            with open(os.path.join(root, "text", key + ".txt"), "w") as f:
                f.write("\n".join(CAPTIONS))
            names.append(key)
            classes.append(i % num_classes)
        with open(os.path.join(root, split, "filenames.pickle"), "wb") as f:
            pickle.dump(names, f, protocol=2)
        with open(os.path.join(root, split, "class_info.pickle"), "wb") as f:
            pickle.dump(classes, f, protocol=2)
    open(done_marker, "w").close()


def write_pair_lists(root: str, n_eval: int = 64) -> None:
    """Verification pair lists ('img1 img2 label') for the valid/test splits
    so Stage1Trainer's validation loader constructs (idempotent; kept outside
    the corpus done-marker so older corpora pick them up)."""
    for split in ("valid", "test"):
        path = os.path.join(root, f"pairs_{split}.txt")
        if os.path.exists(path):
            continue
        lines = []
        for i in range(n_eval):
            j = (i + 1) % n_eval
            lines.append(f"{split}_{i:06d} {split}_{j:06d} {int(i % 2)}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--corpus", default="/tmp/tgfr_e2e_corpus")
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=2,
                    help="timed train epochs (first warms the jit cache)")
    ap.add_argument("--bert-type", default="bert",
                    help="text arch override (groupvit for CPU smokes)")
    ap.add_argument("--uint8", action="store_true",
                    help="uint8-on-the-wire images (4x less h2d)")
    ap.add_argument("--feature-cache", action="store_true",
                    help="per-epoch frozen-backbone precompute")
    args_cli = ap.parse_args()

    import jax
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()

    t0 = time.time()
    build_corpus(args_cli.corpus, args_cli.images)
    write_pair_lists(args_cli.corpus)
    print(json.dumps({"corpus": args_cli.corpus,
                      "build_secs": round(time.time() - t0, 1)}))

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    B = args_cli.batch
    args = TGFRConfig().replace(
        en_type="BERT", bert_type=args_cli.bert_type, synthetic=False,
        data_dir=args_cli.corpus, batch_size=B,
        num_workers=args_cli.num_workers, max_epoch=1,
        valid_pair_list=os.path.join(args_cli.corpus, "pairs_valid.txt"),
        test_pair_list=os.path.join(args_cli.corpus, "pairs_test.txt"),
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, num_classes=4500,
        uint8_images=args_cli.uint8,
        frozen_feature_cache=args_cli.feature_cache)
    trainer = Stage1Trainer(args)

    # 1. loader-only rate (host ceiling)
    n_img, t0 = 0, time.perf_counter()
    for batch in trainer.train_dl:
        n_img += batch["img"].shape[0]
    loader_rate = n_img / (time.perf_counter() - t0)
    print(json.dumps({"metric": "loader_only_images_per_sec",
                      "value": round(loader_rate, 1),
                      "native": trainer.train_ds._native_ok(),
                      "workers": args_cli.num_workers}))

    # 2. compute-only rate (device ceiling; chained-marginal methodology)
    import jax.numpy as jnp
    first = next(iter(trainer.train_dl))
    dev_batch = {k: jnp.asarray(v) for k, v in first.items() if k != "key"}
    frozen = trainer.backbone.variables

    def inner(state, key):
        state, metrics = trainer._train_step_fn(state, dev_batch, frozen, key)
        return state, metrics["total_loss"]

    ks = (2, 6) if args_cli.cpu else (4, 44)
    ms = time_chained_steps(inner, trainer.state, trainer._dropout_key, ks=ks,
                            donate=False)
    compute_rate = B / (ms / 1000.0)
    print(json.dumps({"metric": "compute_only_pairs_per_sec",
                      "value": round(compute_rate, 1),
                      "ms_per_step": round(ms, 3)}))

    # 2b. host->device upload rate of one training batch (on this machine
    # the axon tunnel carries every batch; on a TPU-VM this is local DMA)
    nbytes = sum(v.size * v.dtype.itemsize for v in first.values()
                 if hasattr(v, "size"))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        dev = jax.device_put({k: v for k, v in first.items() if k != "key"})
        jax.block_until_ready(dev)
    h2d_secs = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": "h2d_batches_per_sec",
                      "value": round(1.0 / h2d_secs, 2),
                      "batch_mbytes": round(nbytes / 1e6, 2),
                      "mbytes_per_sec": round(nbytes / 1e6 / h2d_secs, 1)}))

    # 3. the real epoch loop (loader + prefetch_to_device + async steps)
    e2e = None
    for epoch in range(1, args_cli.epochs + 1):
        out = trainer.train_epoch(epoch)
        e2e = out["pairs_per_sec"]
    rpc_bound = B / 0.015
    print(json.dumps({
        "metric": "end_to_end_pairs_per_sec",
        "value": round(e2e, 1),
        "loader_bound": round(loader_rate, 1),
        "compute_bound": round(compute_rate, 1),
        "h2d_bound": round(B / h2d_secs, 1),
        "tunnel_rpc_bound": round(rpc_bound, 1),
        "note": ("e2e is capped by min(loader, h2d, rpc, compute); on this "
                 "host the tunnel carries every batch upload, on a TPU-VM "
                 "h2d is local DMA and the cap is min(loader*cores, "
                 "compute)"),
    }))


if __name__ == "__main__":
    main()
