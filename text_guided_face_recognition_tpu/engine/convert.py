"""torch .pth -> flax parameter converters.

Converts the reference's pretrained checkpoints (frozen COTS backbones:
ArcFace arcface_ir18_ms1mv3.pth, AdaFace adaface_ir18_webface4m.ckpt, MagFace
magface_iresnet18_casia_dp.pth — loaded by reference utils/prepare.py:51-99 —
and HF torch BERT weights) into the NHWC flax trees used here.

Layout rules:
  * conv kernels: OIHW -> HWIO
  * dense kernels: (out, in) -> (in, out)
  * dense layers fed by a flattened conv map: torch flattens NCHW (C,H,W),
    ours flattens NHWC (H,W,C) — the kernel's input axis is permuted
  * BatchNorm: weight->scale, bias->bias, running_{mean,var}->batch_stats;
    scale-free BNs (`features`) with a non-unit torch weight are folded into
    the running variance: var' = (var + eps)/w^2 - eps
  * PReLU: weight -> alpha

torch is used only to deserialize; everything else is numpy.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "convert_iresnet", "convert_irbackbone",
           "convert_magface", "convert_bert_encoder"]


def load_torch_state_dict(path: str, key: str | None = None) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def _conv(sd, name):
    return np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))


def _dense(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _dense_from_flattened_conv(sd, name, c, h, w):
    """Permute the input axis of an fc eating a flattened (C,H,W) map into our
    (H,W,C) flatten order."""
    wt = sd[f"{name}.weight"]                     # (out, C*H*W)
    out_f = wt.shape[0]
    wt = wt.reshape(out_f, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out_f)
    d = {"kernel": wt}
    if f"{name}.bias" in sd:
        d["bias"] = sd[f"{name}.bias"]
    return d


def _bn(sd, name, scale_free: bool = False, eps: float = 1e-5
        ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    mean = sd[f"{name}.running_mean"]
    var = sd[f"{name}.running_var"]
    params: Dict[str, Any] = {}
    if scale_free:
        w = sd.get(f"{name}.weight")
        if w is not None and not np.allclose(w, 1.0):
            var = (var + eps) / np.square(w) - eps
            mean = mean.copy()  # mean unaffected: (x-m)/sigma*w+b with w folded
        if f"{name}.bias" in sd:
            params["bias"] = sd[f"{name}.bias"]
    else:
        params["scale"] = sd[f"{name}.weight"]
        params["bias"] = sd[f"{name}.bias"]
    stats = {"mean": mean, "var": var}
    return params, stats


def convert_iresnet(sd: Dict[str, np.ndarray], layers=(2, 2, 2, 2)
                    ) -> Dict[str, Any]:
    """ArcFace iresnet .pth -> flax {params, batch_stats} (reference arch:
    models/iresnet.py; shipped ckpt: arcface_ir18_ms1mv3.pth)."""
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(sd, "conv1")}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    params["prelu"] = {"alpha": sd["prelu.weight"]}

    for stage, n in enumerate(layers, start=1):
        for i in range(n):
            t = f"layer{stage}.{i}"
            o = f"layer{stage}_{i}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
            p["conv1"] = {"kernel": _conv(sd, f"{t}.conv1")}
            p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
            p["prelu"] = {"alpha": sd[f"{t}.prelu.weight"]}
            p["conv2"] = {"kernel": _conv(sd, f"{t}.conv2")}
            p["bn3"], s["bn3"] = _bn(sd, f"{t}.bn3")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": _conv(sd, f"{t}.downsample.0")}
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[o] = p
            stats[o] = s

    params["bn2"], stats["bn2"] = _bn(sd, "bn2")
    params["fc"] = _dense_from_flattened_conv(sd, "fc", 512, 7, 7)
    feat_p, feat_s = _bn(sd, "features", scale_free=True)
    params["features"] = feat_p
    stats["features"] = feat_s
    return {"params": params, "batch_stats": stats}


def convert_irbackbone(sd: Dict[str, np.ndarray], num_layers: int = 18
                       ) -> Dict[str, Any]:
    """AdaFace IR .ckpt['state_dict'] (keys 'model.*' pre-stripped by the
    caller, reference utils/prepare.py:73) -> flax tree for IRBackbone."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["input_conv"] = {"kernel": _conv(sd, "input_layer.0")}
    params["input_bn"], stats["input_bn"] = _bn(sd, "input_layer.1")
    params["input_prelu"] = {"alpha": sd["input_layer.2.weight"]}

    n_body = max(int(m.group(1)) for k in sd
                 if (m := re.match(r"body\.(\d+)\.", k))) + 1
    for i in range(n_body):
        t = f"body.{i}"
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        if f"{t}.shortcut_layer.0.weight" in sd:
            p["shortcut_conv"] = {"kernel": _conv(sd, f"{t}.shortcut_layer.0")}
            p["shortcut_bn"], s["shortcut_bn"] = _bn(sd, f"{t}.shortcut_layer.1")
        p["res_bn1"], s["res_bn1"] = _bn(sd, f"{t}.res_layer.0")
        p["res_conv1"] = {"kernel": _conv(sd, f"{t}.res_layer.1")}
        p["res_bn2"], s["res_bn2"] = _bn(sd, f"{t}.res_layer.2")
        p["res_prelu"] = {"alpha": sd[f"{t}.res_layer.3.weight"]}
        p["res_conv2"] = {"kernel": _conv(sd, f"{t}.res_layer.4")}
        p["res_bn3"], s["res_bn3"] = _bn(sd, f"{t}.res_layer.5")
        if f"{t}.res_layer.se_block.fc1.weight" in sd:
            p["se"] = {
                "fc1": {"kernel": _conv(sd, f"{t}.res_layer.se_block.fc1")},
                "fc2": {"kernel": _conv(sd, f"{t}.res_layer.se_block.fc2")},
            }
        params[f"body_{i}"] = p
        stats[f"body_{i}"] = s

    params["output_bn"], stats["output_bn"] = _bn(sd, "output_layer.0")
    params["output_fc"] = _dense_from_flattened_conv(sd, "output_layer.3",
                                                     512, 7, 7)
    _, feat_s = _bn(sd, "output_layer.4", scale_free=True)
    stats["output_features"] = feat_s
    return {"params": params, "batch_stats": stats}


def convert_magface(sd: Dict[str, np.ndarray], layers=(2, 2, 2, 2)
                    ) -> Dict[str, Any]:
    """MagFace NetworkBuilder ckpt: keys 'module.features.<iresnet>.*'
    (reference utils/prepare.py:86-99 deletes module.fc.weight)."""
    stripped = {re.sub(r"^module\.features\.", "", k): v for k, v in sd.items()
                if k.startswith("module.features.")}
    return convert_iresnet(stripped, layers)


def convert_bert_encoder(sd: Dict[str, np.ndarray], num_layers: int = 12
                         ) -> Dict[str, Any]:
    """HF torch BertModel state_dict -> our TransformerEncoder('postln')
    param tree (models/text_bert.py)."""
    sd = {re.sub(r"^bert\.", "", k): v for k, v in sd.items()}
    p: Dict[str, Any] = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_emb": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "emb_ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
    }
    for i in range(num_layers):
        t = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attn": {
                "query": _dense(sd, f"{t}.attention.self.query"),
                "key": _dense(sd, f"{t}.attention.self.key"),
                "value": _dense(sd, f"{t}.attention.self.value"),
                "out": _dense(sd, f"{t}.attention.output.dense"),
            },
            "attn_ln": {"scale": sd[f"{t}.attention.output.LayerNorm.weight"],
                        "bias": sd[f"{t}.attention.output.LayerNorm.bias"]},
            "ffn_in": _dense(sd, f"{t}.intermediate.dense"),
            "ffn_out": _dense(sd, f"{t}.output.dense"),
            "ffn_ln": {"scale": sd[f"{t}.output.LayerNorm.weight"],
                       "bias": sd[f"{t}.output.LayerNorm.bias"]},
        }
    return {"params": p}
