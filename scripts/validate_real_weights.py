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

Exit code 0 = all checks within tolerance.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


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
    ok = _report(
        "rtdetr pred_logits", out["pred_logits"],
        theirs["pred_logits"].numpy(), tol=5e-3,
    )
    ok &= _report(
        "rtdetr pred_boxes", out["pred_boxes"],
        theirs["pred_boxes"].numpy(), tol=2e-3,
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
    args = ap.parse_args()

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
