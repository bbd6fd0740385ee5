"""rga3_tpu — TPU-native JAX framework for object-centric video QA with
visual grounding and referring (the capabilities of qirui-chen/RGA3-release,
re-designed TPU-first).

Layers (mirrors SURVEY.md §1):
  ops/        Pallas kernels + pure-function numerics (attention, RoPE, losses)
  models/     Qwen2.5-VL (JAX), SAM2 (JAX, scan-based video memory), UniGR
              composite, STOM point propagation
  parallel/   device mesh, sharding rules (ZeRO-equivalent), collectives
  data/       host-side datasets, processor, visual-prompt rasterizer
  train/      optax training loop, LoRA, Orbax checkpoints, meters
  evaluation/ benchmark drivers + metrics (J&F, gIoU/cIoU, caption metrics)
  serve/      demo app
  runtime/    native (C++) host runtime pieces
"""

__version__ = "0.1.0"
