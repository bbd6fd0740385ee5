"""3B val gIoU: restore params-only from the learning-run checkpoint
(no optimizer state on device) and run the ReasonSeg-val loop."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

import importlib.util
spec = importlib.util.spec_from_file_location("train_mod", "/root/repo/scripts/train.py")
train_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(train_mod)

from rga3_tpu.config import SegHeadConfig
from rga3_tpu.data.processor import QwenVLProcessor
from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
from rga3_tpu.models.sam2 import SAM2_HIERA_L
from rga3_tpu.models.unigr import UniGR, UniGRConfig
from rga3_tpu.evaluation.image_seg_eval import run_reason_seg_val
from rga3_tpu.evaluation.segmentor import UniGRSegmentor

mode = sys.argv[1] if len(sys.argv) > 1 else "trained"

processor = QwenVLProcessor.from_pretrained("dummy")
qcfg = QWEN25_VL_3B
qcfg = qcfg.replace(text=qcfg.text.replace(
    lora_rank=128, lora_alpha=256.0, scan_layers=True))
cfg = UniGRConfig(
    qwen=qcfg, sam2=SAM2_HIERA_L,
    seg=SegHeadConfig(out_dim=SAM2_HIERA_L.d_model,
                      seg_token_id=processor.seg_token_id),
)
model = UniGR(cfg)

t0 = time.time()
params = train_mod.assemble_params(model, cfg, {}, "bfloat16")
print(f"params {time.time()-t0:.0f}s", flush=True)

if mode == "trained":
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore("/tmp/lp3b_ckpt/ckpt_latest")
    # TrainState tuple-like: [params, opt_state, step] or dict
    if isinstance(restored, (list, tuple)):
        tr_params = restored[0]
    elif isinstance(restored, dict) and "params" in restored:
        tr_params = restored["params"]
    else:
        tr_params = restored["0"]
    del restored
    # keep structure from assemble (host np), fill with trained values
    flat_t = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(tr_params)}
    leaves = jax.tree_util.tree_leaves_with_path(params)
    new = [flat_t[jax.tree_util.keystr(k)] for k, _ in leaves]
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new)
    print("restored trained params", flush=True)

seg = UniGRSegmentor(
    model, params, processor, num_frames_mllm=2,
    compute_dtype=jnp.bfloat16,
)
t0 = time.time()
scores = run_reason_seg_val(seg, "/tmp/learn_root", max_samples=8)
print(f"val[{mode}]: {scores} ({time.time()-t0:.0f}s)", flush=True)
