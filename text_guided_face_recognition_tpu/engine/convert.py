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
           "convert_magface", "convert_bert_encoder", "convert_text_heading",
           "convert_image_heading", "convert_fcfm", "convert_linear_fusion",
           "convert_wordlevel_cfa", "convert_text_encoder_bundle"]


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop nn.DataParallel's 'module.' key prefix (reference wraps every
    trained module in DataParallel: utils/prepare.py:17-22,43)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


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


def _qkv_fused(sd, qname, kname, vname):
    """torch q/k/v Linear triplet -> the fused qkv Dense of
    models/text_bert._SelfAttention ([q | k | v] on the output axis)."""
    ks = [np.transpose(sd[f"{n}.weight"], (1, 0)) for n in (qname, kname,
                                                            vname)]
    out = {"kernel": np.concatenate(ks, axis=1)}
    if f"{qname}.bias" in sd:
        out["bias"] = np.concatenate(
            [sd[f"{n}.bias"] for n in (qname, kname, vname)])
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


def convert_bert_encoder(sd: Dict[str, np.ndarray],
                         num_layers: int | None = None) -> Dict[str, Any]:
    """HF torch BertModel state_dict -> our TransformerEncoder('postln')
    param tree (models/text_bert.py). num_layers inferred from the keys
    when not given."""
    sd = {re.sub(r"^bert\.", "", k): v for k, v in sd.items()}
    if num_layers is None:
        num_layers = max(int(m.group(1)) for k in sd
                         if (m := re.match(r"encoder\.layer\.(\d+)\.", k))) + 1
    p: Dict[str, Any] = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "emb_ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
    }
    if "embeddings.token_type_embeddings.weight" in sd:  # absent in BLIP
        p["type_emb"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"]}
    for i in range(num_layers):
        t = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attn": {
                "qkv": _qkv_fused(sd, f"{t}.attention.self.query",
                                  f"{t}.attention.self.key",
                                  f"{t}.attention.self.value"),
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


# ------------------------------------------------------ trained-head layers --
# Converters for the reference's *trained* checkpoints (stage-1/stage-2 head
# bundles saved by src/train_encoders_bert.py:59-80 and src/fusion_bert.py:
# 166-191), so real reference training artifacts load into this framework.

def _dense_from_conv1x1(sd, name):
    """torch Conv2d(C_in, C_out, 1) -> flax Dense over the channel axis."""
    w = sd[f"{name}.weight"]                      # (O, I, 1, 1)
    return {"kernel": w[:, :, 0, 0].T, "bias": sd[f"{name}.bias"]}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _ln_chw(sd, name):
    """torch LayerNorm([C, H, W]) affine -> our LayerNormCHW (H, W, C)."""
    return {"scale": sd[f"{name}.weight"].transpose(1, 2, 0),
            "bias": sd[f"{name}.bias"].transpose(1, 2, 0)}


def _sa(sd, name):
    """reference SelfAttention (models/fusion_nets.py:82-118): three 1x1
    convs -> our SelfAttention2D Dense projections."""
    return {"query_proj": _dense_from_conv1x1(sd, f"{name}.query_proj"),
            "key_proj": _dense_from_conv1x1(sd, f"{name}.key_proj"),
            "value_proj": _dense_from_conv1x1(sd, f"{name}.value_proj")}


def convert_text_heading(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference TextHeading (models/models.py:187-232): Bert_Word_Mapping's
    Conv2d(1, F, (K, E)) kernels -> our window-stacked GEMM kernels.

    Conv2d weight (F, 1, K, E) contracts token-window x embedding; our window
    stacking orders features as [offset0-emb, offset1-emb, ...] = row k*E+e,
    exactly torch's (K, E) row-major flatten."""
    sd = _strip_module(sd)
    p: Dict[str, Any] = {"bwm": {}}
    for idx, K in enumerate((2, 3, 4)):
        w = sd[f"bwm.convs1.{idx}.weight"]        # (F, 1, K, E)
        f = w.shape[0]
        p["bwm"][f"conv_k{K}"] = {
            "kernel": w.reshape(f, -1).T,          # (K*E, F)
            "bias": sd[f"bwm.convs1.{idx}.bias"],
        }
    return {"params": p}


def convert_image_heading(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference ImageHeading + IMIM (models/models.py:328-405)."""
    sd = _strip_module(sd)
    imim: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    imim["bn_img"], stats["bn_img"] = _bn(sd, "imim.bn_img")
    imim["sa"] = _sa(sd, "imim.sa")
    imim["ln"] = _ln_chw(sd, "imim.ln")
    imim["conv1x1_1"] = {"kernel": _conv(sd, "imim.conv1x1_1"),
                         "bias": sd["imim.conv1x1_1.bias"]}
    imim["conv1x1_2"] = {"kernel": _conv(sd, "imim.conv1x1_2"),
                         "bias": sd["imim.conv1x1_2.bias"]}
    imim["project_local"] = {
        "projection": _dense(sd, "imim.project_local.projection")}
    params = {
        "imim": imim,
        "project_global": {
            "projection": _dense(sd, "project_global.projection")},
    }
    return {"params": params, "batch_stats": {"imim": stats}}


def convert_fcfm(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference `Working` FCFM (models/fusion_nets.py:217-258). The 324->128
    linear eats a flattened NCHW (36,3,3) map; our FCFM transposes to NCHW
    order before flattening (models/fusion.py), so the kernel converts as a
    plain dense."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {
        "conv": {"kernel": _conv(sd, "conv"), "bias": sd["conv.bias"]},
        "projection": _dense(sd, "projection"),
        "sa": _sa(sd, "sa"),
        "linear": _dense(sd, "linear"),
        "ln": _ln_chw(sd, "ln"),
        "ln_gl_image": _ln(sd, "ln_gl_image"),
        "ln_sent": _ln(sd, "ln_sent"),
    }
    stats: Dict[str, Any] = {}
    params["bn_img"], stats["bn_img"] = _bn(sd, "bn_img")
    params["bn_word"], stats["bn_word"] = _bn(sd, "bn_word")
    return {"params": params, "batch_stats": stats}


def convert_linear_fusion(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference LinearFusion (models/fusion_nets.py:68-79). Its `ln` member
    is dead (never called in forward) and is dropped."""
    sd = _strip_module(sd)
    return {"params": {"fc1": _dense(sd, "fc1")}}


def convert_wordlevel_cfa(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference WordLevelCFA_LSTM (models/fusion_nets.py:260-291). Its
    `conv`/`bn_img` members are dead (never called in forward) and dropped;
    ln1 converts even though its output is discarded (quirk preserved in our
    module)."""
    sd = _strip_module(sd)
    return {"params": {
        "sa": _sa(sd, "sa"),
        "ln1": _ln_chw(sd, "ln1"),
        "ln2": _ln_chw(sd, "ln2"),
        "linear": _dense(sd, "linear"),
    }}


def convert_clip_text_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF torch CLIPTextModel / GroupViTTextModel state_dict -> our
    TransformerEncoder('preln', causal, final_ln) param tree. Key layout:
    text_model.embeddings.{token,position}_embedding, encoder.layers.N.
    {self_attn.{q,k,v,out}_proj, layer_norm1, layer_norm2, mlp.fc{1,2}},
    final_layer_norm."""
    sd = {re.sub(r"^text_model\.", "", k): v for k, v in sd.items()}
    num_layers = max(int(m.group(1)) for k in sd
                     if (m := re.match(r"encoder\.layers\.(\d+)\.", k))) + 1
    p: Dict[str, Any] = {
        "tok_emb": {"embedding": sd["embeddings.token_embedding.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embedding.weight"]},
        "final_ln": _ln(sd, "final_layer_norm"),
    }
    for i in range(num_layers):
        t = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "attn": {
                "qkv": _qkv_fused(sd, f"{t}.self_attn.q_proj",
                                  f"{t}.self_attn.k_proj",
                                  f"{t}.self_attn.v_proj"),
                "out": _dense(sd, f"{t}.self_attn.out_proj"),
            },
            "attn_ln": _ln(sd, f"{t}.layer_norm1"),
            "ffn_ln": _ln(sd, f"{t}.layer_norm2"),
            "ffn_in": _dense(sd, f"{t}.mlp.fc1"),
            "ffn_out": _dense(sd, f"{t}.mlp.fc2"),
        }
    return {"params": p}


def convert_flava_text_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF torch FlavaTextModel state_dict -> our TransformerEncoder('preln',
    emb_ln, final_ln) tree. FLAVA text = BERT embeddings over ViT pre-LN
    blocks (encoder.layer.N.{attention.attention.{query,key,value},
    attention.output.dense, layernorm_before, layernorm_after,
    intermediate.dense, output.dense}) + trailing `layernorm`."""
    num_layers = max(int(m.group(1)) for k in sd
                     if (m := re.match(r"encoder\.layer\.(\d+)\.", k))) + 1
    p: Dict[str, Any] = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_emb": {"embedding":
                     sd["embeddings.token_type_embeddings.weight"]},
        "emb_ln": _ln(sd, "embeddings.LayerNorm"),
        "final_ln": _ln(sd, "layernorm"),
    }
    for i in range(num_layers):
        t = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attn": {
                "qkv": _qkv_fused(sd, f"{t}.attention.attention.query",
                                  f"{t}.attention.attention.key",
                                  f"{t}.attention.attention.value"),
                "out": _dense(sd, f"{t}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{t}.layernorm_before"),
            "ffn_ln": _ln(sd, f"{t}.layernorm_after"),
            "ffn_in": _dense(sd, f"{t}.intermediate.dense"),
            "ffn_out": _dense(sd, f"{t}.output.dense"),
        }
    return {"params": p}


def convert_hf_text_model(sd: Dict[str, np.ndarray],
                          bert_type: str) -> Dict[str, Any]:
    """Raw HF torch text-model state_dict -> our TransformerEncoder tree,
    dispatched per reference bert_type (models/models.py:123-140)."""
    if bert_type in ("bert", "align", "blip"):
        return convert_bert_encoder(sd)
    if bert_type == "falva":
        return convert_flava_text_encoder(sd)
    if bert_type in ("clip", "groupvit"):
        return convert_clip_text_encoder(sd)
    raise ValueError(f"unknown bert_type {bert_type!r}")


def convert_text_encoder_bundle(sd: Dict[str, np.ndarray],
                                bert_type: str = "bert") -> Dict[str, Any]:
    """reference TextEncoder state_dict (models/models.py:144-151 wraps the HF
    model under 'model.') -> our TextEncoder tree ({'params': {'model': ...}})."""
    sd = _strip_module(sd)
    sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    return {"params": {"model": convert_hf_text_model(sd, bert_type)["params"]}}


def convert_rnn_encoder(sd: Dict[str, np.ndarray],
                        en_type: str = "LSTM") -> Dict[str, Any]:
    """reference RNNEncoder state_dict (models/models.py:236-324: Embedding
    'encoder' + 1-layer bidirectional nn.LSTM/GRU 'rnn') -> our RNNEncoder
    tree (flax OptimizedLSTMCell / GRUCell per direction).

    torch chunks gates along dim 0 — LSTM [i,f,g,o], GRU [r,z,n]. Flax puts
    the bias on the hidden-side dense for LSTM (so b = b_ih + b_hh) and on
    the input-side dense for GRU r/z (b = b_ih + b_hh); the GRU n-gate keeps
    both biases separate (torch computes tanh(W_in x + b_in + r*(W_hn h +
    b_hn)), exactly flax's in/hn split)."""
    sd = _strip_module(sd)
    p: Dict[str, Any] = {"encoder": {"embedding": sd["encoder.weight"]}}
    lstm = en_type.upper() == "LSTM"
    gates = ("i", "f", "g", "o") if lstm else ("r", "z", "n")
    for suffix, ours in (("", "fwd"), ("_reverse", "bwd")):
        if f"rnn.weight_ih_l0{suffix}" not in sd:
            continue  # unidirectional
        wi = sd[f"rnn.weight_ih_l0{suffix}"]
        wh = sd[f"rnn.weight_hh_l0{suffix}"]
        bi = sd[f"rnn.bias_ih_l0{suffix}"]
        bh = sd[f"rnn.bias_hh_l0{suffix}"]
        h = wh.shape[1]
        cell: Dict[str, Any] = {}
        for gi, g in enumerate(gates):
            sl = slice(gi * h, (gi + 1) * h)
            if lstm:
                cell[f"i{g}"] = {"kernel": wi[sl].T}
                cell[f"h{g}"] = {"kernel": wh[sl].T, "bias": bi[sl] + bh[sl]}
            elif g == "n":
                cell["in"] = {"kernel": wi[sl].T, "bias": bi[sl]}
                cell["hn"] = {"kernel": wh[sl].T, "bias": bh[sl]}
            else:
                cell[f"i{g}"] = {"kernel": wi[sl].T, "bias": bi[sl] + bh[sl]}
                cell[f"h{g}"] = {"kernel": wh[sl].T}
        p[ours] = cell
    return {"params": p}
