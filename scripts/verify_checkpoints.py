"""One-command real-weight verification (VERDICT round-1 item 9).

Given HF/torch checkpoint dirs, run loader -> per-block activation diff ->
small eval slices for BASELINE measurement configs 1-4, and emit ONE JSON
report. Runs end-to-end on tiny/random weights today so the moment real
UniGR-7B / sam2_hiera_large.pt / scaled_offline.pth files land, the
parity numbers fall out of a single invocation:

  python scripts/verify_checkpoints.py --tiny --out verify.json
  python scripts/verify_checkpoints.py \
      --unigr_dir /path/UniGR-7B \
      --sam2_ckpt /path/sam2_hiera_large.pt \
      --cotracker_ckpt /path/scaled_offline.pth \
      --out verify.json

Stages (each isolated; one failure doesn't stop the rest):
  load          checkpoint -> param tree for every provided component
  act_diff      per-block drift vs HF transformers (scripts/activation_diff)
  config1_qa    demo QA path: frames -> processor -> prefill+decode -> text
  config2_vip   ViP-Bench-style region QA (rasterized overlay + decode)
  config3_seg   ReasonSeg-style [SEG] -> SAM2 single-frame mask (gIoU)
  config4_vos   MeViS-style video [SEG] -> per-frame masks (J&F)

BASELINE.md configs; refs: app.py demo path, evaluation/vipbench/
inference_vipbench.py, evaluation/eval_img/val.py, evaluation/
mevis_val_u/inference_mevis.py.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="random tiny models end-to-end (no checkpoints)")
    p.add_argument("--unigr_dir", default=None,
                   help="merged UniGR HF dir (SurplusDeficit/UniGR-7B)")
    p.add_argument("--sam2_ckpt", default=None,
                   help="sam2_hiera_large.pt (standalone check; the UniGR "
                   "dir already embeds SAM2 weights)")
    p.add_argument("--cotracker_ckpt", default=None,
                   help="CoTracker3 scaled_offline.pth")
    p.add_argument("--samples", type=int, default=5,
                   help="eval-slice samples per config")
    p.add_argument("--skip_act_diff", action="store_true")
    p.add_argument("--out", default="verify_checkpoints.json")
    return p.parse_args()


def stage(report, name, fn):
    t0 = time.time()
    try:
        out = fn() or {}
        report[name] = {"ok": True, "seconds": round(time.time() - t0, 1),
                        **out}
        print(f"[verify] {name}: ok ({report[name]['seconds']}s)",
              flush=True)
    except Exception as e:  # isolate stages
        report[name] = {
            "ok": False, "seconds": round(time.time() - t0, 1),
            "error": f"{type(e).__name__}: {e}",
            "trace": traceback.format_exc(limit=4),
        }
        print(f"[verify] {name}: FAIL — {e}", flush=True)


def giou_ciou(pred, gt):
    import numpy as np

    inter = float(np.logical_and(pred, gt).sum())
    union = float(np.logical_or(pred, gt).sum())
    return inter / max(union, 1.0)


def main():
    args = parse_args()
    import numpy as np

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rga3_tpu.data.processor import QwenVLProcessor
    from rga3_tpu.evaluation.segmentor import UniGRChat, UniGRSegmentor

    report = {"mode": "tiny" if args.tiny else "real", "configs": {}}
    rng = np.random.default_rng(0)
    state = {}

    # ---------------- load ------------------------------------------
    def do_load():
        info = {}
        if args.tiny:
            from rga3_tpu.models.qwen25vl import tiny_config
            from rga3_tpu.models.sam2 import tiny_sam2_config
            from rga3_tpu.models.unigr.model import (
                SegHeadConfig, UniGR, UniGRConfig,
            )

            qcfg = tiny_config(vocab_size=152_000)
            scfg = tiny_sam2_config(image_size=64).replace(d_model=32)
            proc = QwenVLProcessor.from_pretrained(
                "dummy", max_pixels=16 * 28 * 28,
                video_max_pixels=16 * 28 * 28,
            )
            cfg = UniGRConfig(
                qwen=qcfg, sam2=scfg,
                seg=SegHeadConfig(out_dim=32,
                                  seg_token_id=proc.seg_token_id),
            )
            model = UniGR(cfg)
            frames = jnp.asarray(
                rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
            )
            lang = jnp.asarray(
                rng.normal(size=(2, 1, 32)).astype(np.float32)
            )
            ids = jnp.asarray(
                rng.integers(0, 1000, size=(1, 8)).astype(np.int32)
            )
            params = model.init(jax.random.PRNGKey(0), frames, lang, ids)
            info["params_mb"] = round(sum(
                x.size * x.dtype.itemsize
                for x in jax.tree.leaves(params)
            ) / 1e6, 1)
            state.update(model=model, params=params, proc=proc, cfg=cfg)
        else:
            if not args.unigr_dir:
                raise ValueError("--unigr_dir required without --tiny")
            from rga3_tpu.config import SegHeadConfig
            from rga3_tpu.models.qwen25vl import QWEN25_VL_7B
            from rga3_tpu.models.qwen25vl.loader import load_unigr_params
            from rga3_tpu.models.sam2 import SAM2_HIERA_L
            from rga3_tpu.models.unigr import UniGR, UniGRConfig

            proc = QwenVLProcessor.from_pretrained(args.unigr_dir)
            cfg = UniGRConfig(
                qwen=QWEN25_VL_7B, sam2=SAM2_HIERA_L,
                seg=SegHeadConfig(
                    out_dim=SAM2_HIERA_L.d_model,
                    seg_token_id=proc.seg_token_id,
                ),
            )
            model = UniGR(cfg)
            params = load_unigr_params(args.unigr_dir)
            n = sum(int(x.size) for x in jax.tree.leaves(params))
            info["n_params"] = n
            state.update(model=model, params=params, proc=proc, cfg=cfg)
        if args.sam2_ckpt:
            from rga3_tpu.models.sam2.loader import load_sam2_params

            sp = load_sam2_params(args.sam2_ckpt)
            info["sam2_leaves"] = len(jax.tree.leaves(sp))
        if args.cotracker_ckpt:
            # config inferred from the checkpoint's own tensor shapes —
            # resolves the undocumented token-concat width mechanically
            from rga3_tpu.models.stom import build_cotracker3_from_checkpoint

            ct, cp = build_cotracker3_from_checkpoint(args.cotracker_ckpt)
            info["cotracker_leaves"] = len(jax.tree.leaves(cp))
            info["cotracker_input_dim"] = ct.cfg.input_dim
            info["cotracker_flow"] = [
                ct.cfg.flow_emb_dim, ct.cfg.flow_cat_coords,
            ]
            state["cotracker"] = (ct, cp)
        return info

    stage(report, "load", do_load)
    if not report["load"]["ok"]:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps({"verify": "load failed"}))
        return 1

    # ---------------- activation diff -------------------------------
    if not args.skip_act_diff:
        def do_act():
            cmd = [sys.executable,
                   os.path.join(os.path.dirname(__file__),
                                "activation_diff.py"),
                   "--dtype", "bf16"]
            cmd += ["--tiny"] if args.tiny else ["--hf_dir", args.unigr_dir]
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600
            )
            if r.returncode != 0:
                raise RuntimeError(r.stderr[-800:])
            return {"tail": r.stdout.strip().splitlines()[-8:]}

        stage(report, "act_diff", do_act)

    model, params, proc = state["model"], state["params"], state["proc"]
    cfg = state["cfg"]

    def synth_frames(n, size=64):
        return [
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            for _ in range(n)
        ]

    # ---------------- config 1: demo QA -----------------------------
    def do_qa():
        chat = UniGRChat(model, params, proc, max_new_tokens=8,
                         compute_dtype=jnp.float32 if args.tiny else None)
        state["chat"] = chat
        outs = []
        for _ in range(min(args.samples, 2) if args.tiny else args.samples):
            outs.append(chat.answer(
                "What is happening in this video?",
                video_frames=synth_frames(2),
            ))
        assert all(isinstance(o, str) for o in outs)
        return {"n": len(outs), "sample": outs[0][:80]}

    stage(report["configs"], "config1_qa", do_qa)

    # ---------------- config 2: ViP-Bench region QA -----------------
    def do_vip():
        from PIL import Image

        from rga3_tpu.data.visual_prompts.generator import image_blending

        chat = state.get("chat") or UniGRChat(
            model, params, proc, max_new_tokens=8,
            compute_dtype=jnp.float32 if args.tiny else None,
        )
        img = Image.fromarray(synth_frames(1, 96)[0])
        img, _ = image_blending(
            img, shape="rectangle", bbox_coord=(10, 10, 60, 60),
            rgb_value=(255, 0, 0), image_size_anchor=96,
        )
        out = chat.answer(
            "What is within the red rectangle?",
            images=[np.asarray(img)],
        )
        assert isinstance(out, str)
        return {"sample": out[:80]}

    stage(report["configs"], "config2_vip", do_vip)

    # ---------------- config 3: image [SEG] -------------------------
    def do_seg_img():
        seg = UniGRSegmentor(
            model, params, proc,
            num_frames_mllm=2, sam_chunk=2,
            compute_dtype=jnp.float32 if args.tiny else None,
        )
        state["seg"] = seg
        frames = synth_frames(2)
        gt = np.zeros((64, 64), bool)
        gt[16:48, 16:48] = True
        masks = seg.segment_video(frames, "the bright square")
        pred = np.asarray(masks[0]) > 0
        return {"pred_area": int(pred.sum()), "giou_vs_synth_gt":
                round(giou_ciou(pred, gt), 4)}

    stage(report["configs"], "config3_seg", do_seg_img)

    # ---------------- config 4: video [SEG] (J&F) -------------------
    def do_vos():
        from rga3_tpu.evaluation.jf_metrics import db_eval_boundary, db_eval_iou

        seg = state.get("seg")
        if seg is None:
            raise RuntimeError("config3 segmentor unavailable")
        frames = synth_frames(4)
        masks = seg.segment_video(frames, "the moving object")
        gt = np.zeros((len(masks), 64, 64), np.uint8)
        gt[:, 20:44, 20:44] = 1
        js, fs = [], []
        for m, g in zip(masks, gt):
            pm = (np.asarray(m) > 0).astype(np.uint8)
            js.append(db_eval_iou(g, pm))
            fs.append(db_eval_boundary(g, pm))
        return {"J_mean": round(float(np.mean(js)), 4),
                "F_mean": round(float(np.mean(fs)), 4),
                "frames": len(masks)}

    stage(report["configs"], "config4_vos", do_vos)

    # ---------------- config 5: int4 serving path --------------------
    # (ref inference_mevis.py:70-93 load_in_4bit) — int4 LM + int8 vision
    # through the same quantize_for_serving transform used on real weights
    def do_int4():
        from rga3_tpu.models.unigr.model import UniGR
        from rga3_tpu.ops.quant import quantize_for_serving

        qcfg4 = cfg.qwen.replace(
            text=cfg.qwen.text.replace(quant_int4=True),
            vision=cfg.qwen.vision.replace(quant_int8=True),
        )
        model4 = UniGR(cfg.replace(qwen=qcfg4))
        params4 = {
            col: (
                {**sub, "qwen": quantize_for_serving(sub["qwen"], "int4")}
                if isinstance(sub, dict) and "qwen" in sub else sub
            )
            for col, sub in params.items()
        }
        chat4 = UniGRChat(
            model4, params4, proc, max_new_tokens=8,
            compute_dtype=jnp.float32 if args.tiny else None,
        )
        out = chat4.answer(
            "What is happening?", video_frames=synth_frames(2)
        )
        assert isinstance(out, str)
        n_q4 = sum(
            1 for p in jax.tree_util.tree_flatten_with_path(params4)[0]
            if "kernel_q4" in str(p[0])
        )
        assert n_q4 > 0, "no int4-packed kernels in the serving tree"
        return {"int4_kernels": n_q4, "sample": out[:80]}

    stage(report["configs"], "config5_int4", do_int4)

    # ---------------- config 6: speculative decoding ------------------
    # (serve --draft_dir/--spec_k) — draft-and-verify greedy is
    # token-exact, so the spec answer must equal the plain greedy answer
    def do_spec():
        from rga3_tpu.models.qwen25vl.model import Qwen25VL

        draft_model = Qwen25VL(cfg.qwen)
        draft_params = {
            col: sub["qwen"]
            for col, sub in params.items()
            if isinstance(sub, dict) and "qwen" in sub
        }
        frames = synth_frames(2)
        plain = state["chat"].answer("Describe the scene.",
                                     video_frames=frames)
        chat_s = UniGRChat(
            model, params, proc, max_new_tokens=8,
            compute_dtype=jnp.float32 if args.tiny else None,
            draft_model=draft_model, draft_params=draft_params, spec_k=2,
        )
        spec = chat_s.answer("Describe the scene.", video_frames=frames)
        assert spec == plain, (
            f"speculative != greedy: {spec!r} vs {plain!r}"
        )
        return {"sample": spec[:80], "token_exact": True}

    stage(report["configs"], "config6_spec", do_spec)

    # ---------------- config 7: STOM propagation (BASELINE config 5) --
    # (ref inference_videoinfer.py:199,259-270 --use_stom) — overlay
    # propagated by a CoTracker3Offline backend, then the propagated
    # frames go through the QA path: the full region-QA pipeline.
    def do_stom():
        import cv2

        from rga3_tpu.models.stom import STOM
        from rga3_tpu.models.stom.cotracker3 import (
            CoTracker3Offline, CoTracker3Predictor, shipped_tracker,
            tiny_cotracker3_config,
        )

        if state.get("cotracker"):
            ct, cp = state["cotracker"]
            tracker = CoTracker3Predictor(cp, ct, max_points=64)
            backend = "official_ckpt"
        else:
            tracker = shipped_tracker(max_points=64)
            backend = "shipped"
            if tracker is None or args.tiny:
                cmodel = CoTracker3Offline(tiny_cotracker3_config())
                cparams = cmodel.init(
                    jax.random.PRNGKey(1),
                    jnp.zeros((2, 64, 96, 3)), jnp.zeros((4, 3)),
                )
                tracker = CoTracker3Predictor(
                    cparams, cmodel, max_points=64
                )
                backend = "tiny_random"
        stom = STOM(tracker=tracker)
        frames = []
        for i in range(4):
            f = rng.integers(0, 80, (96, 128, 3)).astype(np.uint8)
            f[30 + 4 * i:60 + 4 * i, 40 + 6 * i:80 + 6 * i] = 210
            frames.append(f)
        vip = np.zeros((96, 128, 4), np.uint8)
        cv2.ellipse(vip, (60, 45), (25, 20), 0, 0, 360,
                    (255, 0, 0, 255), 3)
        out_frames = stom.propagate_in_video(frames, vip, 0, "ellipse")
        assert len(out_frames) == len(frames)
        key_has_overlay = not np.array_equal(
            np.asarray(out_frames[0]), frames[0]
        )
        assert key_has_overlay, "key frame not composited"
        chat = state.get("chat")
        ans = chat.answer(
            "What is the marked region doing?",
            video_frames=[np.asarray(f) for f in out_frames],
        )
        assert isinstance(ans, str)
        n_prop = sum(
            int(not np.array_equal(np.asarray(o), f))
            for o, f in zip(out_frames[1:], frames[1:])
        )
        return {"backend": backend, "propagated_frames": n_prop,
                "sample": ans[:80]}

    stage(report["configs"], "config7_stom", do_stom)

    # ---------------- config 8: pre-quantized checkpoint load ---------
    # (scripts/quantize_checkpoint.py) — save_quantized -> load_quantized
    # roundtrip must reproduce the in-memory quantized tree exactly and
    # still decode.
    def do_prequant():
        import tempfile

        from rga3_tpu.models.unigr.model import UniGR
        from rga3_tpu.ops.quant import (
            load_quantized, quantize_for_serving, save_quantized,
        )

        # mode "int8" = int8 LM + int8 vision (quantize_for_serving)
        qcfg8 = cfg.qwen.replace(
            text=cfg.qwen.text.replace(quant_int8=True),
            vision=cfg.qwen.vision.replace(quant_int8=True),
        )
        qtree = {
            col: (
                {**sub, "qwen": quantize_for_serving(sub["qwen"], "int8")}
                if isinstance(sub, dict) and "qwen" in sub else sub
            )
            for col, sub in params.items()
        }
        with tempfile.TemporaryDirectory() as d:
            save_quantized(qtree, d, {"quant": "int8", "tiny": args.tiny})
            loaded, meta = load_quantized(d)
            flat_a = jax.tree_util.tree_leaves_with_path(qtree)
            flat_b = {
                jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(loaded)
            }
            assert len(flat_a) == len(flat_b), "tree structure drifted"
            for k, v in flat_a:
                got = flat_b[jax.tree_util.keystr(k)]
                assert np.array_equal(np.asarray(v), np.asarray(got)), (
                    f"roundtrip mismatch at {jax.tree_util.keystr(k)}"
                )
            model8 = UniGR(cfg.replace(qwen=qcfg8))
            chat8 = UniGRChat(
                model8, loaded, proc, max_new_tokens=8,
                compute_dtype=jnp.float32 if args.tiny else None,
            )
            out = chat8.answer(
                "What is happening?", video_frames=synth_frames(2)
            )
        assert isinstance(out, str)
        return {"meta": meta, "sample": out[:80]}

    stage(report["configs"], "config8_prequant", do_prequant)

    # ---------------- config 9: LEARNED tiny checkpoint ---------------
    # The round-5 learning-proof run (scripts/train.py on the visible-
    # target fixture, tests/synth_data.build_learn_root) ships its best
    # params as a committed f16 npz. This stage validates BEHAVIOR, not
    # just plumbing: the learned model's masks must clearly beat chance
    # on FRESH target positions, where the random-init model scores ~0.
    def do_learned():
        npz = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if "__file__" in globals() else ".",
            "runs", "learning_proof_tiny", "params_f16.npz",
        )
        if not os.path.exists(npz):
            return {"skipped": "no learned checkpoint committed"}
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "export_learned_tiny",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "export_learned_tiny.py"),
        )
        elt = ilu.module_from_spec(spec)
        spec.loader.exec_module(elt)
        lmodel, lcfg, lproc = elt.build_train_tiny_model()
        lparams = elt.load_params_npz(npz)

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
        ))
        from synth_data import build_learn_root

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            build_learn_root(d, seed=11)  # positions unseen in training
            scores = elt.eval_giou(lmodel, lparams, lproc, d, n=6)
        assert scores["gIoU"] > 0.5, (
            f"learned checkpoint gIoU {scores['gIoU']:.3f} <= 0.5 — "
            "does not beat chance"
        )
        return {"gIoU": round(scores["gIoU"], 4),
                "cIoU": round(scores["cIoU"], 4), "n": scores["n"]}

    stage(report["configs"], "config9_learned", do_learned)

    ok = report["load"]["ok"] and all(
        v.get("ok") for v in report["configs"].values()
    )
    report["all_ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "verify_checkpoints": report["mode"], "all_ok": report["all_ok"],
        "out": args.out,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
