"""wedetect_tpu — TPU-native open-vocabulary detection framework.

A from-scratch JAX/XLA rebuild of the WeDetect family
(WeDetect / WeDetect-Uni / WeDetect-Ref): one-stage open-vocabulary
detectors whose classification branch scores per-anchor region
embeddings against text (or learned-prompt) embeddings with a
cosine-similarity matmul, plus a Qwen3-VL-based referring-expression
scorer.

Design: single jit-compiled static-shape graphs, NHWC layouts, bf16
compute with f32 parity mode, scaling via jax.sharding Mesh + XLA
collectives. See README.md and PARITY.md.

Quick start:
    from wedetect_tpu import Detector
    det = Detector.from_torch_checkpoint("wedetect_base.pth", "base")
    det.reparameterize(["person", "dog"])
    results = det(["demo.jpg"], score_thr=0.1)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import wedetect_tpu` light (no jax import)
    if name == "Detector":
        from wedetect_tpu.models.api import Detector

        return Detector
    if name == "RefScorer":
        from wedetect_tpu.models.ref_api import RefScorer

        return RefScorer
    if name in ("ModelCfg", "get_config", "wedetect_tiny",
                "wedetect_base", "wedetect_large", "wedetect_uni"):
        import wedetect_tpu.configs as configs

        return getattr(configs, name)
    raise AttributeError(name)
