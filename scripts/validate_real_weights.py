"""Validate the framework against REAL pretrained checkpoints.

This environment is offline, so all accuracy work in the repo is
structural (torch mirrors with random weights, differential fuzzing of
the pure-Python layers, golden JSON tests).  The moment the HF
checkpoints are reachable, THIS script closes the loop:

    download_model                       # prefetch all default repos
    python scripts/validate_real_weights.py

For each default model it
  1. loads the torch state_dict from the weight store,
  2. runs the torch MIRROR of the reference architecture
     (tests/torch_ref/) with those weights,
  3. runs this repo's JAX model through its converter with the same
     weights,
  4. reports elementwise forward deltas — any disagreement beyond bf16
     noise means a conversion or architecture bug, localized per model;
and for the recognizer it additionally
  5. decodes real line crops with the int8 K/V cache on and off and
     reports greedy-string agreement (the audit the int8 default asks
     for — set YOMITOKU_TPU_INT8_KV=0 if it disagrees on your data).

The WHOLE pipeline can be dress-rehearsed offline TODAY with seeded
torch mirrors standing in for the unreachable HF checkpoints:

    python scripts/validate_real_weights.py --rehearse /tmp/rehearsal

drives save -> weights.py conversion -> msgpack cache -> module
from_pretrained load -> load-time int8-KV self-audit -> module parity
artifact (det quads / rec strings / layout boxes) -> msgpack-roundtrip
comparison -> an injected outlier-K tripwire that must flip the audit
to the f32 fallback, and writes rehearsal_report.json.  Exit code 0 =
every rehearsed stage behaved.

Exit code 0 = all checks within tolerance.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _pin_parity_numerics():
    """Run the checks on the host CPU in f32 with exact matmuls.

    This script COMPARES against a float32 torch mirror — comparable
    numerics are a precondition, not a policy choice.  The driver exports
    JAX_PLATFORMS=axon and the plugin copies it into jax.config, so the
    env var alone is not enough (same dance as tests/conftest.py); and on
    the TPU the bf16 compute default would scramble RT-DETR's top-k query
    selection at the near-ties random/real logits produce.  The int8-KV
    and width-bucket audits exercised here are platform-independent paths.
    """
    os.environ.setdefault("YOMITOKU_TPU_DTYPE", "f32")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")


def _load_sd(cfg):
    from yomitoku_tpu.weights import (
        _find_torch_checkpoint,
        load_torch_state_dict,
        weights_dir,
    )

    path = _find_torch_checkpoint(cfg)
    if path is None:
        raise FileNotFoundError(
            f"no checkpoint for {cfg.hf_hub_repo} under {weights_dir()} — "
            "run download_model first"
        )
    return load_torch_state_dict(path)


def _report(name, ours, theirs, tol):
    delta = np.abs(np.asarray(ours, np.float32) - np.asarray(theirs, np.float32))
    ok = delta.max() <= tol
    print(
        f"{name}: max|Δ|={delta.max():.3e} mean|Δ|={delta.mean():.3e} "
        f"tol={tol:g} -> {'OK' if ok else 'MISMATCH'}"
    )
    return ok


def validate_dbnet(rng):
    import torch

    from tests.torch_ref.dbnet_torch import DBNetTorch
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    cfg = structured(TextDetectorDBNetV2_1Config)
    sd = _load_sd(cfg)
    x = rng.rand(1, 256, 320, 3).astype(np.float32)

    ref = DBNetTorch()
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()[:, 0]

    model = DBNet(cfg)
    model.params = model.convert_torch_state_dict(sd)
    ours = model.forward_binary(x)
    return _report("dbnet-v2_1 prob map", ours, theirs, tol=2e-3)


def validate_parseq(rng, crops=None):
    import torch

    from tests.torch_ref.parseq_torch import PARSeqTorch
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqLargeV41Config)
    sd = _load_sd(cfg)
    model = PARSeq(cfg)
    model.int8_kv = False
    model.params = model.convert_torch_state_dict(sd)
    h, w = model.core.img_size
    if crops is None:
        crops = rng.rand(4, h, w, 3).astype(np.float32) * 2.0 - 1.0

    ref = PARSeqTorch(cfg)
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    ref.eval()
    with torch.no_grad():
        t_logits = ref(torch.from_numpy(crops).permute(0, 3, 1, 2))
    theirs = torch.softmax(t_logits, dim=-1).numpy()

    ours = model.forward_probs(crops)
    # the torch mirror truncates at the batch early-exit step
    L = theirs.shape[1]
    ok = _report("parseq-large final probs", ours[:, :L], theirs, tol=5e-3)

    # int8 K/V audit: greedy ids with the cache quantized vs f32
    ids_f32, _ = model.forward_tokens(crops)
    q8 = PARSeq(cfg)
    q8.int8_kv = True
    q8.params = model.params
    ids_q8, _ = q8.forward_tokens(crops)
    agree = float((ids_f32 == ids_q8).mean())
    print(f"parseq int8-K/V greedy agreement: {agree:.4f} "
          f"({'OK' if agree >= 0.999 else 'AUDIT: consider YOMITOKU_TPU_INT8_KV=0'})")

    # width-bucket audit: greedy ids for narrow content at half canvas vs
    # the full padded canvas.  TextRecognizer runs the same audit at
    # real-checkpoint load (audit_width_buckets) and auto-enables the
    # bucket only on full agreement; this offline report is the
    # bulk-sample version of that gate.
    narrow = np.array(crops)
    narrow[:, :, w // 2 :] = -1.0  # blank the right half (pad value)
    ids_full, _ = model.forward_tokens(narrow)
    ids_half, _ = model.forward_tokens(
        np.ascontiguousarray(narrow[:, :, : w // 2])
    )
    agree_w = float((ids_full == ids_half).mean())
    print(f"parseq width-bucket (w={w // 2}) greedy agreement: {agree_w:.4f} "
          f"({'OK (load-time audit will auto-enable)' if agree_w >= 0.999 else 'AUDIT: set YOMITOKU_TPU_REC_WIDTH_BUCKETS=0'})")
    return ok


def validate_rtdetr(rng):
    import torch

    from tests.torch_ref.load_reference import build_reference_rtdetr
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import LayoutParserRTDETRv2V2Config
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    cfg = structured(LayoutParserRTDETRv2V2Config)
    sd = _load_sd(cfg)
    x = rng.rand(1, 640, 640, 3).astype(np.float32)

    ref = build_reference_rtdetr(cfg)
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2))

    model = RTDETRv2(cfg)
    model.params = model.convert_torch_state_dict(sd)
    out = model.forward(x)
    tl = theirs["pred_logits"].numpy()
    tb = theirs["pred_boxes"].numpy()
    jl = np.asarray(out["pred_logits"], np.float32)
    jb = np.asarray(out["pred_boxes"], np.float32)
    # Even at matched f32 numerics a few of the 300 top-k queries can flip
    # when dense anchor scores tie to within float rounding (guaranteed
    # somewhere on random stand-in weights, possible on real ones), and a
    # flipped selection changes that query's decoder output entirely.
    # Compare per query and require near-all to agree position-wise.
    q_ok = (np.abs(jl - tl).max(axis=-1) <= 5e-3) & (
        np.abs(jb - tb).max(axis=-1) <= 2e-3
    )
    frac = float(q_ok.mean())
    # 0.90: random-init deep nets collapse token variance, so dense anchor
    # scores bunch within float rounding and a slice of the top-300 flips
    # either way; matched queries agree to ~1e-6, flipped ones to O(1), so
    # any conversion bug drags the fraction to ~0, not to 0.9x.
    ok = frac >= 0.90
    print(
        f"rtdetr per-query parity: {frac:.4f} of queries within tol "
        f"(logits 5e-3 / boxes 2e-3) -> {'OK' if ok else 'MISMATCH'}"
    )
    return ok


def emit_module_outputs(images, out_path):
    """Run the REAL task modules (TextDetector quads, TextRecognizer
    strings, LayoutParser boxes) with pretrained weights on ``images``
    and dump a JSON parity artifact.

    The matching reference-side artifact comes from
    scripts/dump_reference_outputs.py run in an environment where the
    PyTorch reference is installed; ``--compare`` then scores the pair."""
    import json

    from yomitoku_tpu.data import load_image
    from yomitoku_tpu.layout_parser import LayoutParser
    from yomitoku_tpu.text_detector import TextDetector
    from yomitoku_tpu.text_recognizer import TextRecognizer

    det = TextDetector(from_pretrained=True)
    rec = TextRecognizer(from_pretrained=True)
    lay = LayoutParser(from_pretrained=True)
    for m in (det, rec, lay):
        if m.model.pretrained_source is None:
            raise FileNotFoundError(
                "pretrained weights missing — run download_model first"
            )

    pages = []
    for path in images:
        for img in load_image(path):
            d, _ = det(img)
            r, _ = rec(img, d.points)
            l, _ = lay(img)
            pages.append(
                {
                    "image": str(path),
                    "det": {"points": d.points, "scores": d.scores},
                    "rec": {
                        "contents": r.contents,
                        "scores": r.scores,
                        "points": [np.asarray(p).tolist() for p in r.points],
                        "directions": r.directions,
                    },
                    "layout": {
                        cat: [
                            {"box": e.box, "score": e.score, "role": e.role}
                            for e in getattr(l, cat)
                        ]
                        for cat in ("paragraphs", "tables", "figures")
                    },
                }
            )
    Path(out_path).write_text(json.dumps({"pages": pages}))
    print(f"wrote {len(pages)} page(s) to {out_path}")


def _quad_iou(a, b):
    ax = np.asarray(a, np.float64).reshape(4, 2)
    bx = np.asarray(b, np.float64).reshape(4, 2)
    ax1, ay1 = ax.min(0)
    ax2, ay2 = ax.max(0)
    bx1, by1 = bx.min(0)
    bx2, by2 = bx.max(0)
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union > 0 else 0.0


def compare_module_outputs(ours_path, ref_path, iou_thresh=0.9,
                           min_det_match=0.98, min_rec_agree=0.98,
                           min_layout_match=0.95):
    """Score a parity artifact pair (ours vs the reference dump):
    detector quads by axis-aligned IoU matching, recognizer strings by
    exact agreement on IoU-matched quads, layout boxes by per-category
    IoU matching.  Prints the report; returns overall pass."""
    import json

    ours = json.loads(Path(ours_path).read_text())["pages"]
    ref = json.loads(Path(ref_path).read_text())["pages"]
    if len(ours) != len(ref):
        print(f"page count differs: ours={len(ours)} ref={len(ref)}")
        return False

    det_hits = det_total = 0
    rec_hits = rec_total = 0
    lay_hits = lay_total = 0
    for po, pr in zip(ours, ref):
        ref_quads = pr["det"]["points"]
        taken = [False] * len(ref_quads)
        matches = {}
        for i, q in enumerate(po["det"]["points"]):
            best, best_j = 0.0, None
            for j, rq in enumerate(ref_quads):
                if taken[j]:
                    continue
                iou = _quad_iou(q, rq)
                if iou > best:
                    best, best_j = iou, j
            if best_j is not None and best >= iou_thresh:
                taken[best_j] = True
                matches[i] = best_j
                det_hits += 1
        det_total += max(len(ref_quads), len(po["det"]["points"]))

        # recognizer strings on IoU-matched line quads
        o_by_quad = {
            tuple(np.asarray(p).reshape(-1).tolist()): c
            for p, c in zip(po["rec"]["points"], po["rec"]["contents"])
        }
        r_by_quad = {
            tuple(np.asarray(p).reshape(-1).tolist()): c
            for p, c in zip(pr["rec"]["points"], pr["rec"]["contents"])
        }
        for op, rp_ in ((po["det"]["points"][i], ref_quads[j])
                        for i, j in matches.items()):
            oc = o_by_quad.get(tuple(np.asarray(op).reshape(-1).tolist()))
            rc = r_by_quad.get(tuple(np.asarray(rp_).reshape(-1).tolist()))
            if oc is None or rc is None:
                continue
            rec_total += 1
            rec_hits += oc == rc

        for cat in ("paragraphs", "tables", "figures"):
            ob = [e["box"] for e in po["layout"][cat]]
            rb = [e["box"] for e in pr["layout"][cat]]
            taken = [False] * len(rb)
            for b in ob:
                for j, r2 in enumerate(rb):
                    if not taken[j] and _quad_iou(
                        [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]],
                        [[r2[0], r2[1]], [r2[2], r2[1]], [r2[2], r2[3]],
                         [r2[0], r2[3]]],
                    ) >= iou_thresh:
                        taken[j] = True
                        lay_hits += 1
                        break
            lay_total += max(len(ob), len(rb))

    det_rate = det_hits / det_total if det_total else 1.0
    rec_rate = rec_hits / rec_total if rec_total else 1.0
    lay_rate = lay_hits / lay_total if lay_total else 1.0
    ok = (
        det_rate >= min_det_match
        and rec_rate >= min_rec_agree
        and lay_rate >= min_layout_match
    )
    print(
        f"det quad match (IoU>={iou_thresh}): {det_rate:.4f} "
        f"(>= {min_det_match} {'OK' if det_rate >= min_det_match else 'FAIL'})"
    )
    print(
        f"rec string agreement on matched quads: {rec_rate:.4f} "
        f"(>= {min_rec_agree} {'OK' if rec_rate >= min_rec_agree else 'FAIL'})"
    )
    print(
        f"layout box match: {lay_rate:.4f} "
        f"(>= {min_layout_match} {'OK' if lay_rate >= min_layout_match else 'FAIL'})"
    )
    return ok


def _save_standin_checkpoints(store, seed):
    """Save seeded torch-MIRROR state_dicts into the weight store in the
    exact layout download_model produces (<repo>/pytorch_model.bin) —
    stand-ins for the real HF checkpoints, flowing through the identical
    load path (weights._find_torch_checkpoint -> convert -> msgpack)."""
    import torch

    from tests.torch_ref.dbnet_torch import DBNetTorch
    from tests.torch_ref.load_reference import build_reference_rtdetr
    from tests.torch_ref.parseq_torch import PARSeqTorch
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import (
        LayoutParserRTDETRv2V2Config,
        TextDetectorDBNetV2_1Config,
        TextRecognizerPARSeqLargeV41Config,
    )

    specs = (
        (TextDetectorDBNetV2_1Config, lambda cfg: DBNetTorch()),
        (TextRecognizerPARSeqLargeV41Config, PARSeqTorch),
        (LayoutParserRTDETRv2V2Config, build_reference_rtdetr),
    )
    for cfg_cls, build in specs:
        cfg = structured(cfg_cls)
        torch.manual_seed(seed)
        d = Path(store) / cfg.hf_hub_repo.split("/")[-1]
        d.mkdir(parents=True, exist_ok=True)
        torch.save(build(cfg).state_dict(), d / "pytorch_model.bin")
        print(f"stand-in checkpoint: {d / 'pytorch_model.bin'}")


def inject_k_outlier(src_bin, dst_bin, row=7, scale=1.0e3):
    """Copy a parseq checkpoint, multiplying one row of the decoder
    cross-attention K projection by ``scale`` — the outlier-dimension
    failure mode per-head symmetric int8 quantization cannot represent
    (the blown-up scale crushes every other K dimension to ~0)."""
    import torch

    sd = torch.load(str(src_bin), map_location="cpu", weights_only=True)
    w = sd["decoder.layers.0.cross_attn.in_proj_weight"]
    E = w.shape[1]
    w[E + row, :] = w[E + row, :] * scale  # K block = rows [E, 2E)
    Path(dst_bin).parent.mkdir(parents=True, exist_ok=True)
    torch.save(sd, str(dst_bin))


def rehearse(workdir, images, seed):
    """End-to-end dress rehearsal of the real-weight audit pipeline
    (VERDICT r4 #5), runnable fully offline.  Returns overall pass."""
    import json
    import shutil

    work = Path(workdir)
    store = work / "store"
    if store.exists():
        shutil.rmtree(store)
    os.environ["YOMITOKU_TPU_WEIGHTS"] = str(store)
    report = {"seed": seed, "store": str(store)}

    print("== 1/5 stand-in checkpoints (seeded torch mirrors) ==")
    _save_standin_checkpoints(store, seed)

    print("== 2/5 tensor parity through the store + converters ==")
    rng = np.random.RandomState(seed)
    ok_t = True
    for fn in (validate_dbnet, validate_parseq, validate_rtdetr):
        ok_t &= bool(fn(rng))
    report["tensor_checks_ok"] = ok_t

    # force the TPU int8 policy so the load-time audit path executes on
    # any backend (the rehearsal is about the PATH, not the platform)
    from yomitoku_tpu.models import parseq as parseq_mod

    orig_default = parseq_mod._int8_kv_default
    parseq_mod._int8_kv_default = lambda: True
    try:
        print("== 3/5 module from_pretrained load + int8-KV self-audit ==")
        from yomitoku_tpu.text_recognizer import TextRecognizer

        rec = TextRecognizer(from_pretrained=True)
        if rec.model.pretrained_source is None:
            raise RuntimeError("stand-in checkpoint did not load")
        report["pretrained_source"] = rec.model.pretrained_source
        # on REAL checkpoints int8 parity is expected; on random stand-ins
        # either verdict is legitimate (near-tie argmax) — what the
        # rehearsal pins is that the audit RAN and chose deterministically
        report["clean_audit_keeps_int8"] = bool(rec.model.int8_kv)
        report["width_buckets_after_audit"] = rec._auto_width_buckets
        del rec

        print("== 4/5 module parity artifact + msgpack roundtrip ==")
        ours = work / "module_outputs.json"
        emit_module_outputs(images, ours)
        # second emission loads the msgpack cache written by the first
        # (weights.load_pretrained_params) — a real store-roundtrip check
        again = work / "module_outputs_roundtrip.json"
        emit_module_outputs(images, again)
        roundtrip_ok = compare_module_outputs(ours, again, iou_thresh=0.99,
                                              min_det_match=1.0,
                                              min_rec_agree=1.0,
                                              min_layout_match=1.0)
        report["module_artifact"] = str(ours)
        report["msgpack_roundtrip_ok"] = bool(roundtrip_ok)

        print("== 5/5 outlier-K tripwire through the full load path ==")
        store2 = work / "store_outlier"
        if store2.exists():
            shutil.rmtree(store2)
        from yomitoku_tpu.config import structured
        from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config

        repo = structured(
            TextRecognizerPARSeqLargeV41Config
        ).hf_hub_repo.split("/")[-1]
        inject_k_outlier(
            store / repo / "pytorch_model.bin",
            store2 / repo / "pytorch_model.bin",
        )
        os.environ["YOMITOKU_TPU_WEIGHTS"] = str(store2)
        rec2 = TextRecognizer(from_pretrained=True)
        report["outlier_trips_int8_fallback"] = not rec2.model.int8_kv
        del rec2
    finally:
        parseq_mod._int8_kv_default = orig_default
        os.environ["YOMITOKU_TPU_WEIGHTS"] = str(store)

    out = work / "rehearsal_report.json"
    out.write_text(json.dumps(report, indent=2))
    ok = (
        ok_t
        and report["msgpack_roundtrip_ok"]
        and report["outlier_trips_int8_fallback"]
    )
    print(json.dumps(report, indent=2))
    print(f"rehearsal {'PASS' if ok else 'FAIL'} — report at {out}")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--emit", metavar="OUT_JSON",
        help="run the real task modules on --images and dump the parity "
        "artifact (quads/strings/boxes) instead of the tensor checks",
    )
    ap.add_argument(
        "--images", nargs="*",
        default=["/root/reference/demo/sample.pdf"],
        help="pages for --emit (default: the reference demo PDF)",
    )
    ap.add_argument(
        "--compare", nargs=2, metavar=("OURS_JSON", "REF_JSON"),
        help="score a parity artifact pair (see "
        "scripts/dump_reference_outputs.py for the reference side)",
    )
    ap.add_argument(
        "--rehearse", metavar="WORKDIR",
        help="dress-rehearse the whole pipeline offline with seeded torch "
        "mirrors as stand-in checkpoints (writes rehearsal_report.json)",
    )
    args = ap.parse_args()
    _pin_parity_numerics()

    if args.rehearse:
        images = args.images
        if images == ap.get_default("images"):
            # the 10-page demo PDF is overkill for a rehearsal; one page
            images = [str(Path(__file__).parent.parent / "demo" / "sample_text.png")]
        sys.exit(0 if rehearse(args.rehearse, images, args.seed) else 1)
    if args.compare:
        sys.exit(0 if compare_module_outputs(*args.compare) else 1)
    if args.emit:
        emit_module_outputs(args.images, args.emit)
        sys.exit(0)

    rng = np.random.RandomState(args.seed)
    ok = True
    for fn in (validate_dbnet, validate_parseq, validate_rtdetr):
        try:
            ok &= fn(rng)
        except FileNotFoundError as e:
            print(f"SKIP ({e})")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
