"""wedetect_tpu — TPU-native open-vocabulary detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the WeDetect family
(WeDetect / WeDetect-Uni / WeDetect-Ref): one-stage open-vocabulary
detectors whose classification branch scores per-anchor region embeddings
against text (or learned-prompt) embeddings with a cosine-similarity
matmul.

Design: a single jit-compiled, static-shape detect graph
(image -> ConvNeXt -> BiFPAN -> head -> similarity matmul -> static
top-k + NMS), NHWC layouts, bf16 compute with f32 parity mode, scaling
via jax.sharding Mesh + XLA collectives.
"""

__version__ = "0.1.0"
