"""Torch-checkpoint -> JAX pytree converter.

Implements the reference's de-facto checkpoint schema (SURVEY.md §2.4):
the mmdet training tree (`backbone.image_model.model.*`,
`bbox_head.head_module.*` with mmcv ConvModule sub-names) is first
canonicalized with the same key remap the reference's standalone scripts
apply (behavioral spec: generate_proposal.py:1236-1254), then mapped
into this package's flax variable tree.

Weight layout transforms:
    conv  OIHW -> HWIO           (incl. depthwise (C,1,kh,kw)->(kh,kw,1,C))
    linear (out,in) -> (in,out)
    conv-transpose (in,out,2,2)  -> kept as-is (Transpose2x stores torch
                                    layout)
    BN weight/bias/running_mean/running_var -> scale/bias + batch_stats

All converters take a flat {torch_key: np.ndarray} dict and a key prefix
and return (params_subtree, batch_stats_subtree) nested dicts.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from wedetect_tpu.configs import ModelCfg

Array = np.ndarray
Flat = Mapping[str, Array]


def _t_conv(wt: Array) -> Array:
    return np.transpose(wt, (2, 3, 1, 0))


def _t_lin(wt: Array) -> Array:
    return np.transpose(wt)


def canonicalize_torch_keys(sd: Flat) -> Dict[str, Array]:
    """mmdet-format keys -> standalone-format keys.

    Mirrors the remap in generate_proposal.py:1236-1254:
      backbone.image_model.model.X -> backbone.X
      bbox_head.head_module.X -> bbox_head.X  with ConvModule names
      flattened: {lvl}.0.conv->.0, .0.bn->.1, .1.conv->.3, .1.bn->.4,
      .{lvl}.2.->.{lvl}.6.
    Text-tower keys (backbone.text_model.*) pass through unchanged.
    Already-canonical keys pass through unchanged.
    """
    out: Dict[str, Array] = {}
    for key, val in sd.items():
        if "num_batches_tracked" in key:
            continue
        k = key
        if k.startswith("backbone.image_model.model."):
            k = "backbone." + k[len("backbone.image_model.model."):]
        if k.startswith("bbox_head.head_module."):
            k = "bbox_head." + k[len("bbox_head.head_module."):]
            for lvl in ("0.", "1.", "2."):
                k = k.replace(f"preds.{lvl}2.", f"preds.{lvl}6.")
            k = k.replace("1.bn.", "4.")
            k = k.replace("1.conv.", "3.")
            k = k.replace("0.bn.", "1.")
            k = k.replace("0.conv.", "0.")
        out[k] = np.asarray(val)
    return out


def convert_ln(sd: Flat, p: str) -> Dict:
    return {"scale": sd[p + "weight"], "bias": sd[p + "bias"]}


def convert_convbn(sd: Flat, p: str, block: bool = True
                   ) -> Tuple[Dict, Dict]:
    """ConvBNReLU/ConvBNSiLU (torch `X.block.conv/bn` or `X.conv/bn`)."""
    b = p + ("block." if block and (p + "block.conv.weight") in sd else "")
    params = {
        "conv": {"kernel": _t_conv(sd[b + "conv.weight"])},
        "bn": {"scale": sd[b + "bn.weight"], "bias": sd[b + "bn.bias"]},
    }
    stats = {"bn": {"mean": sd[b + "bn.running_mean"],
                    "var": sd[b + "bn.running_var"]}}
    return params, stats


def convert_bottlerep(sd: Flat, p: str) -> Tuple[Dict, Dict]:
    p1, s1 = convert_convbn(sd, p + "conv1.")
    p2, s2 = convert_convbn(sd, p + "conv2.")
    params = {"conv1": p1, "conv2": p2}
    stats = {"conv1": s1, "conv2": s2}
    if p + "alpha" in sd:
        params["alpha"] = sd[p + "alpha"]
    return params, stats


def convert_repblock(sd: Flat, p: str, n: int) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    params["conv1"], stats["conv1"] = convert_bottlerep(sd, p + "conv1.")
    for i in range(max(n // 2 - 1, 0)):
        params[f"block_{i}"], stats[f"block_{i}"] = convert_bottlerep(
            sd, p + f"block.{i}.")
    return params, stats


def convert_bepc3(sd: Flat, p: str, n: int) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for cv in ("cv1", "cv2", "cv3"):
        params[cv], stats[cv] = convert_convbn(sd, p + cv + ".")
    params["m"], stats["m"] = convert_repblock(sd, p + "m.", n)
    return params, stats


def convert_bifusion(sd: Flat, p: str) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for cv in ("cv1", "cv2", "cv3", "downsample"):
        params[cv], stats[cv] = convert_convbn(sd, p + cv + ".")
    params["upsample"] = {
        "kernel": sd[p + "upsample.upsample_transpose.weight"],
        "bias": sd[p + "upsample.upsample_transpose.bias"],
    }
    return params, stats


def _dense(sd: Flat, p: str) -> Dict:
    d = {"kernel": _t_lin(sd[p + "weight"])}
    if p + "bias" in sd:
        d["bias"] = sd[p + "bias"]
    return d


def convert_csp2(sd: Flat, p: str, n: int) -> Tuple[Dict, Dict]:
    """CSPLayerWithTwoConv (reference yolo_bricks.py:88-159): mmcv
    ConvModule main/final convs + n DarknetBottleneck(conv1 3x3,
    conv2 3x3) blocks."""
    params, stats = {}, {}
    for name in ("main_conv", "final_conv"):
        params[name], stats[name] = convert_convbn(sd, p + name + ".")
    for i in range(n):
        bp, bs = {}, {}
        for c in ("conv1", "conv2"):
            bp[c], bs[c] = convert_convbn(sd, p + f"blocks.{i}.{c}.")
        params[f"block{i}"], stats[f"block{i}"] = bp, bs
    return params, stats


def convert_max_sigmoid_attn(sd: Flat, p: str) -> Tuple[Dict, Dict]:
    """MaxSigmoidAttnBlock (reference yolo_bricks.py:162-244)."""
    params: Dict = {"guide_fc": _dense(sd, p + "guide_fc."),
                    "bias": sd[p + "bias"]}
    stats: Dict = {}
    if p + "scale" in sd:
        params["scale"] = sd[p + "scale"]
    if p + "embed_conv.conv.weight" in sd:
        params["embed_conv"], stats["embed_conv"] = convert_convbn(
            sd, p + "embed_conv.")
    params["project_conv"], stats["project_conv"] = convert_convbn(
        sd, p + "project_conv.")
    return params, stats


def convert_max_csp(sd: Flat, p: str, n: int) -> Tuple[Dict, Dict]:
    """MaxSigmoidCSPLayerWithTwoConv (yolo_bricks.py:403-457):
    convert_csp2 + the attn branch."""
    params, stats = convert_csp2(sd, p, n)
    params["attn_block"], stats["attn_block"] = convert_max_sigmoid_attn(
        sd, p + "attn_block.")
    return params, stats


def convert_image_pool_attn(sd: Flat, p: str, num_feats: int = 3
                            ) -> Tuple[Dict, Dict]:
    """ImagePoolingAttentionModule (yolo_bricks.py:572-649).  The
    projections are plain conv+bias (mmcv ConvModule without norm)."""
    params: Dict = {}
    for i in range(num_feats):
        params[f"projection{i}"] = {"conv": {
            "kernel": _t_conv(sd[p + f"projections.{i}.conv.weight"]),
            "bias": sd[p + f"projections.{i}.conv.bias"]}}
    for name in ("query", "key", "value"):
        params[f"{name}_ln"] = convert_ln(sd, p + name + ".0.")
        params[f"{name}_fc"] = _dense(sd, p + name + ".1.")
    params["proj"] = _dense(sd, p + "proj.")
    if p + "scale" in sd:
        params["scale"] = sd[p + "scale"]
    return params, {}


def convert_yolo_world_pafpn(sd: Flat, p: str, n_blocks: int,
                             num_levels: int = 3, dual: bool = False
                             ) -> Tuple[Dict, Dict]:
    """YOLOWorldPAFPN / YOLOWorldDualPAFPN (reference
    necks/yolo_world_pafpn.py:1144-1364 over the base_yolo_neck.py
    forward): reduce/upsample/out layers are parameterless; top-down and
    bottom-up layers are MaxSigmoid CSP bricks, downsamples ConvModules."""
    params, stats = {}, {}
    for i in range(num_levels - 1):
        params[f"top_down{i}"], stats[f"top_down{i}"] = convert_max_csp(
            sd, p + f"top_down_layers.{i}.", n_blocks)
        params[f"bottom_up{i}"], stats[f"bottom_up{i}"] = convert_max_csp(
            sd, p + f"bottom_up_layers.{i}.", n_blocks)
        params[f"downsample{i}"], stats[f"downsample{i}"] = convert_convbn(
            sd, p + f"downsample_layers.{i}.")
    if dual:
        params["text_enhancer"], _ = convert_image_pool_attn(
            sd, p + "text_enhancer.", num_levels)
    return params, stats


def convert_mmdet_csp(sd: Flat, p: str, n: int) -> Tuple[Dict, Dict]:
    """mmdet CSPLayer (C3) as used by reference necks/yolov5_pafpn.py:
    main/short/final ConvModules + n bottlenecks (conv1 1x1, conv2 3x3)."""
    params, stats = {}, {}
    for name in ("main_conv", "short_conv", "final_conv"):
        params[name], stats[name] = convert_convbn(sd, p + name + ".")
    for i in range(n):
        for c in ("conv1", "conv2"):
            key = f"block{i}_{c}"
            params[key], stats[key] = convert_convbn(
                sd, p + f"blocks.{i}.{c}.")
    return params, stats


def convert_yolov5_pafpn(sd: Flat, p: str, n_blocks: int
                         ) -> Tuple[Dict, Dict]:
    """YOLOv5PAFPN (reference necks/yolov5_pafpn.py:26-181), 3 levels."""
    params, stats = {}, {}
    params["reduce2"], stats["reduce2"] = convert_convbn(
        sd, p + "reduce_layers.2.")
    # top_down_layers.0 = Sequential(CSP, 1x1 reduce); .1 = CSP
    params["top_down0"], stats["top_down0"] = convert_mmdet_csp(
        sd, p + "top_down_layers.0.0.", n_blocks)
    params["top_down0_reduce"], stats["top_down0_reduce"] = convert_convbn(
        sd, p + "top_down_layers.0.1.")
    params["top_down1"], stats["top_down1"] = convert_mmdet_csp(
        sd, p + "top_down_layers.1.", n_blocks)
    for i in range(2):
        params[f"downsample{i}"], stats[f"downsample{i}"] = convert_convbn(
            sd, p + f"downsample_layers.{i}.")
        params[f"bottom_up{i}"], stats[f"bottom_up{i}"] = convert_mmdet_csp(
            sd, p + f"bottom_up_layers.{i}.", n_blocks)
    return params, stats


def convert_yolov8_pafpn(sd: Flat, p: str, n_blocks: int,
                         num_levels: int = 3) -> Tuple[Dict, Dict]:
    """YOLOv8PAFPN (reference necks/yolov8_pafpn.py:25-113)."""
    params, stats = {}, {}
    for i in range(num_levels - 1):
        params[f"top_down{i}"], stats[f"top_down{i}"] = convert_csp2(
            sd, p + f"top_down_layers.{i}.", n_blocks)
        params[f"bottom_up{i}"], stats[f"bottom_up{i}"] = convert_csp2(
            sd, p + f"bottom_up_layers.{i}.", n_blocks)
        params[f"downsample{i}"], stats[f"downsample{i}"] = convert_convbn(
            sd, p + f"downsample_layers.{i}.")
    return params, stats


def convert_convnext(sd: Flat, p: str, depths) -> Dict:
    params = {
        "stem_conv": {"kernel": _t_conv(sd[p + "downsample_layers.0.0.weight"]),
                      "bias": sd[p + "downsample_layers.0.0.bias"]},
        "stem_norm": convert_ln(sd, p + "downsample_layers.0.1."),
    }
    for i in (1, 2, 3):
        params[f"down{i}_norm"] = convert_ln(
            sd, p + f"downsample_layers.{i}.0.")
        params[f"down{i}_conv"] = {
            "kernel": _t_conv(sd[p + f"downsample_layers.{i}.1.weight"]),
            "bias": sd[p + f"downsample_layers.{i}.1.bias"]}
    for i in range(4):
        for j in range(depths[i]):
            bp = p + f"stages.{i}.{j}."
            params[f"stage{i}_block{j}"] = {
                "dwconv": {"kernel": _t_conv(sd[bp + "dwconv.weight"]),
                           "bias": sd[bp + "dwconv.bias"]},
                "norm": convert_ln(sd, bp + "norm."),
                "pwconv1": {"kernel": _t_lin(sd[bp + "pwconv1.weight"]),
                            "bias": sd[bp + "pwconv1.bias"]},
                "pwconv2": {"kernel": _t_lin(sd[bp + "pwconv2.weight"]),
                            "bias": sd[bp + "pwconv2.bias"]},
                "gamma": sd[bp + "gamma"],
            }
    return params


def convert_neck(sd: Flat, p: str, repeats: int) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    name_map = {
        "reduce0": "reduce_layer0.", "reduce1": "reduce_layer1.",
        "downsample2": "downsample2.", "downsample1": "downsample1.",
    }
    for ours, theirs in name_map.items():
        params[ours], stats[ours] = convert_convbn(sd, p + theirs)
    for ours, theirs in (("bifusion0", "Bifusion0."),
                         ("bifusion1", "Bifusion1.")):
        params[ours], stats[ours] = convert_bifusion(sd, p + theirs)
    for ours, theirs in (("rep_p4", "Rep_p4."), ("rep_p3", "Rep_p3."),
                         ("rep_n3", "Rep_n3."), ("rep_n4", "Rep_n4.")):
        params[ours], stats[ours] = convert_bepc3(sd, p + theirs, repeats)
    return params, stats


def _convert_tower_convbn(sd: Flat, p: str, idx: int) -> Tuple[Dict, Dict]:
    """One flat-Sequential ConvBN: conv at idx, bn at idx+1."""
    params = {
        "conv": {"kernel": _t_conv(sd[f"{p}{idx}.weight"])},
        "bn": {"scale": sd[f"{p}{idx + 1}.weight"],
               "bias": sd[f"{p}{idx + 1}.bias"]},
    }
    stats = {"bn": {"mean": sd[f"{p}{idx + 1}.running_mean"],
                    "var": sd[f"{p}{idx + 1}.running_var"]}}
    return params, stats


def convert_head(sd: Flat, p: str, num_levels: int = 3
                 ) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for i in range(num_levels):
        for branch, tname in (("cls", "cls_preds"), ("reg", "reg_preds")):
            tp = f"{p}{tname}.{i}."
            params[f"{branch}{i}_conv0"], stats[f"{branch}{i}_conv0"] = (
                _convert_tower_convbn(sd, tp, 0))
            params[f"{branch}{i}_conv1"], stats[f"{branch}{i}_conv1"] = (
                _convert_tower_convbn(sd, tp, 3))
            params[f"{branch}{i}_pred"] = {"conv": {
                "kernel": _t_conv(sd[tp + "6.weight"]),
                "bias": sd[tp + "6.bias"]}}
        cp = f"{p}cls_contrasts.{i}."
        params[f"contrast{i}"] = {
            "norm": {"scale": sd[cp + "norm.weight"],
                     "bias": sd[cp + "norm.bias"]},
            "bias": np.asarray(sd[cp + "bias"]).reshape(()),
            "logit_scale": np.asarray(sd[cp + "logit_scale"]).reshape(()),
        }
        stats[f"contrast{i}"] = {"norm": {
            "mean": sd[cp + "norm.running_mean"],
            "var": sd[cp + "norm.running_var"]}}
    return params, stats


def convert_detector(sd: Flat, cfg: ModelCfg) -> Dict:
    """Full canonical-format state dict -> flax `variables` dict."""
    sd = canonicalize_torch_keys(sd)
    params: Dict = {}
    stats: Dict = {}
    params["backbone"] = convert_convnext(sd, "backbone.", cfg.depths)
    params["neck"], stats["neck"] = convert_neck(sd, "neck.",
                                                 cfg.neck_repeats)
    params["head"], stats["head"] = convert_head(sd, "bbox_head.")
    if cfg.num_prompts and "embeddings" in sd:
        params["embeddings"] = sd["embeddings"]
    if cfg.num_prompts and "adapter.0.weight" in sd:
        params["adapter_fc1"] = {"kernel": _t_lin(sd["adapter.0.weight"]),
                                 "bias": sd["adapter.0.bias"]}
        params["adapter_fc2"] = {"kernel": _t_lin(sd["adapter.2.weight"]),
                                 "bias": sd["adapter.2.bias"]}
    import jax.numpy as jnp
    to_jnp = lambda x: jnp.asarray(np.asarray(x, np.float32))  # noqa: E731
    import jax
    return {
        "params": jax.tree.map(to_jnp, params),
        "batch_stats": jax.tree.map(to_jnp, stats),
    }


def load_torch_checkpoint(path: str) -> Dict[str, Array]:
    """Load a .pth file into a flat numpy dict (handles 'state_dict')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}
