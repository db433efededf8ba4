"""Convert reference torch checkpoints to Orbax once, offline.

prepare_* converts .pth files on the fly at every launch; this CLI does it
once and writes the Orbax tree the factories load directly:

  python tools/convert_weights.py arcface arcface_ir18_ms1mv3.pth out_dir
  python tools/convert_weights.py adaface adaface_ir18_webface4m.ckpt out_dir
  python tools/convert_weights.py magface magface_iresnet18_casia_dp.pth out_dir
  python tools/convert_weights.py bert    pytorch_model.bin out_dir [--layers 12]

The backbone outputs are saved as {params, batch_stats}; BERT as
{model: {params}} (the text-encoder checkpoint layout).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=("arcface", "adaface", "magface", "bert"))
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--layers", type=int, default=12,
                    help="transformer layers (bert)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from text_guided_face_recognition_tpu.engine import convert as C
    from text_guided_face_recognition_tpu.engine.checkpoint import (
        save_checkpoint)

    if args.kind == "arcface":
        sd = C.load_torch_state_dict(args.pth)
        tree = C.convert_iresnet(sd)
    elif args.kind == "adaface":
        sd = C.load_torch_state_dict(args.pth, key="state_dict")
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
        tree = C.convert_irbackbone(sd)
    elif args.kind == "magface":
        sd = C.load_torch_state_dict(args.pth, key="state_dict")
        sd.pop("module.fc.weight", None)
        tree = C.convert_magface(sd)
    else:  # bert
        sd = C.load_torch_state_dict(args.pth)
        tree = {"model": C.convert_bert_encoder(sd, num_layers=args.layers)}

    import numpy as np
    tree = __import__("jax").tree_util.tree_map(np.asarray, tree)
    path = save_checkpoint(args.out, tree)
    n = sum(np.prod(x.shape) for x in
            __import__("jax").tree_util.tree_leaves(tree))
    print(f"wrote {args.kind} checkpoint ({int(n):,} values) to {path}")


if __name__ == "__main__":
    main()
