"""High-level detector API: checkpoint in, detections out.

The user-facing equivalent of the reference's init_detector +
reparameterize + inference_detector flow (reference
infer_wedetect.py:102-195, yolo_world.py:58-61):

    det = Detector.from_torch_checkpoint("wedetect_base.pth", "base")
    det.reparameterize(["person", "dog"])        # text tower, once
    results = det(["img1.jpg", "img2.jpg"])      # jitted detect graph

Uni (learned-prompt) checkpoints work the same with
`Detector.from_torch_checkpoint(..., uni=True)`; no text needed.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from wedetect_tpu.configs import ModelCfg, get_config
from wedetect_tpu.models import wedetect as W
from wedetect_tpu.ops.letterbox import preprocess_image, yolov5_letterbox


@dataclasses.dataclass
class Detector:
    cfg: ModelCfg
    variables: Dict
    text_params: Optional[Dict] = None
    tokenizer_path: str = "xlm-roberta-base"
    _text_embeds: Optional[np.ndarray] = None
    class_names: Optional[List[str]] = None
    # "pipeline" = mmdet two-stage cv2 flavor (infer_wedetect/test.py);
    # "yolov5" = the standalone scripts' PIL letterbox
    # (generate_proposal.py:17-83) — Uni constructors default to it
    preproc: str = "pipeline"

    @classmethod
    def from_torch_checkpoint(cls, path: str, size: str = "base",
                              uni: bool = False, num_prompts: int = 256,
                              tokenizer_path: str = "xlm-roberta-base",
                              **cfg_kw) -> "Detector":
        from wedetect_tpu.ckpt.convert import (canonicalize_torch_keys,
                                               convert_detector,
                                               load_torch_checkpoint)
        from wedetect_tpu.nn.xlmr import convert_hf_text_tower

        name = f"uni_{size}" if uni else size
        cfg = get_config(name, **cfg_kw) if not uni else (
            get_config(name, num_prompts=num_prompts, **cfg_kw))
        sd = load_torch_checkpoint(path)
        variables = convert_detector(sd, cfg)
        text_params = None
        canon = canonicalize_torch_keys(sd)
        tm = "backbone.text_model."
        if any(k.startswith(tm + "model.") for k in canon):
            # embedded text tower (reference:
            # extract_embedding.py:1293-1304 loads it from the same ckpt)
            tsd = {k[len(tm + "model."):]: v for k, v in canon.items()
                   if k.startswith(tm + "model.")}
            for hk in ("head.weight", "head.bias"):
                if tm + hk in canon:
                    tsd[hk] = canon[tm + hk]
            text_params = convert_hf_text_tower(tsd, cfg.text)
        return cls(cfg=cfg, variables=variables,
                   text_params=text_params,
                   tokenizer_path=tokenizer_path,
                   preproc="yolov5" if uni else "pipeline")

    @classmethod
    def from_random(cls, size: str = "base", seed: int = 0,
                    **cfg_kw) -> "Detector":
        cfg = get_config(size, **cfg_kw)
        return cls(cfg=cfg, variables=W.init_variables(cfg, seed=seed),
                   preproc="yolov5" if size.startswith("uni")
                   else "pipeline")

    # ----------------------------------------------------------------- text
    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Run the text tower over class prompts -> (K, 768) embeddings."""
        import jax.numpy as jnp

        from wedetect_tpu.data.tokenizer import TextTokenizer
        from wedetect_tpu.nn.xlmr import TextTower

        assert self.text_params is not None, "no text tower weights"
        tok = TextTokenizer(self.tokenizer_path)
        ids, mask = tok(texts)
        out = TextTower(self.cfg.text).apply(
            {"params": self.text_params}, jnp.asarray(ids),
            jnp.asarray(mask))
        return np.asarray(out)

    def reparameterize(self, texts: Sequence[str],
                       embeds: Optional[np.ndarray] = None) -> None:
        """Cache text embeddings (runs the text tower once).

        `embeds` bypasses the text tower (e.g. precomputed banks).
        """
        self.class_names = list(texts)
        self._text_embeds = (np.asarray(embeds) if embeds is not None
                             else self.encode_texts(texts))

    # ------------------------------------------------------------ detection
    def __call__(self, images: Sequence[Union[str, np.ndarray]],
                 score_thr: float = 0.0, max_dets: Optional[int] = None
                 ) -> List[Dict[str, np.ndarray]]:
        """Detect on a list of image paths / HWC RGB arrays."""
        import jax.numpy as jnp

        from wedetect_tpu.data.loader import load_image_rgb

        cfg = self.cfg
        if cfg.num_prompts:
            w = None
        else:
            assert self._text_embeds is not None, (
                "call reparameterize(texts) first")
            w = jnp.asarray(self._text_embeds)

        arrs, sfs, pads, oris = [], [], [], []
        pre = (yolov5_letterbox if self.preproc == "yolov5"
               else preprocess_image)
        for im in images:
            result = None
            if (self.preproc != "yolov5" and isinstance(im, str)
                    and im.lower().endswith((".jpg", ".jpeg"))):
                # fused native decode+letterbox (cv2 fallback below)
                from wedetect_tpu.native import decode_letterbox

                with open(im, "rb") as f:
                    result = decode_letterbox(f.read(), cfg.img_size)
            if result is None:
                arr = load_image_rgb(im) if isinstance(im, str) else im
                result = pre(arr, cfg.img_size)
            padded, sf, pad, ori = result
            arrs.append(padded)
            sfs.append(sf)
            pads.append(pad)
            oris.append(np.array(ori, np.float32))
        det = W.detect_step(
            cfg, self.variables, jnp.asarray(np.stack(arrs)), w,
            jnp.asarray(np.stack(sfs)), jnp.asarray(np.stack(pads)),
            jnp.asarray(np.stack(oris)))
        out = []
        for i in range(len(images)):
            valid = np.asarray(det.valid[i])
            sc = np.asarray(det.scores[i])
            keep = valid & (sc > score_thr)
            if max_dets:
                keep &= np.cumsum(keep) <= max_dets
            out.append({
                "bboxes": np.asarray(det.boxes[i])[keep],
                "scores": sc[keep],
                "labels": np.asarray(det.labels[i])[keep],
                "embeddings": np.asarray(det.embeds[i])[keep],
            })
        return out
