"""TextRecognizer task module (PARSeq).

Reference parity: yomitoku/text_recognizer.py — catalog of PARSeq
variants, perspective-crop dataset, minibatched inference, NFKC-normalized
decode, per-quad direction, and the low-score 180-degree orientation
fallback.  TPU adaptations:

  * batches are padded up to a small set of static bucket sizes so XLA
    compiles a handful of programs instead of one per line count;
  * the whole greedy decode runs on device inside one jitted program
    (models/parseq.py); only a packed (2, B, L) top-1 tensor (argmax ids
    and their probabilities) returns to the host for tokenizer decode.
"""

import os
import unicodedata

import cv2
import numpy as np

from .base import BaseModelCatalog, BaseModule
from .configs import (
    TextRecognizerPARSeqConfig,
    TextRecognizerPARSeqLargeV41Config,
    TextRecognizerPARSeqSmallConfig,
    TextRecognizerPARSeqTinyConfig,
    TextRecognizerPARSeqV2Config,
)
from .data.dataset import ParseqDataset
from .data.functions import resize_with_padding
from .models.parseq import PARSeq
from .postprocessor.parseq_tokenizer import ParseqTokenizer as Tokenizer
from .schemas import TextRecognizerSchema
from .utils.misc import load_charset

#: Batch-size buckets (padded) to bound the number of compiled programs.
BATCH_BUCKETS = (1, 8, 32, 128)


def bucket_batch_size(n: int, max_batch: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b and b <= max_batch:
            return b
    return max_batch


class TextRecognizerModelCatalog(BaseModelCatalog):
    def __init__(self):
        super().__init__()
        self.register("parseq", TextRecognizerPARSeqConfig, PARSeq)
        self.register("parseqv2", TextRecognizerPARSeqV2Config, PARSeq)
        self.register("parseq-small", TextRecognizerPARSeqSmallConfig, PARSeq)
        self.register("parseq-tiny", TextRecognizerPARSeqTinyConfig, PARSeq)
        self.register("parseq-large-v4_1", TextRecognizerPARSeqLargeV41Config, PARSeq)


class TextRecognizer(BaseModule):
    model_catalog = TextRecognizerModelCatalog()

    def __init__(
        self,
        model_name="parseq-large-v4_1",
        path_cfg=None,
        device="tpu",
        visualize=False,
        from_pretrained=True,
        infer_onnx=False,  # accepted for API compat; ONNX path replaced by JAX
        rec_orientation_fallback=False,
        rec_orientation_fallback_thresh=0.75,
        num_devices=None,
    ):
        super().__init__()
        self.load_model(model_name, path_cfg, from_pretrained=from_pretrained)
        # self-verifying int8 default: on first load of REAL (converted)
        # params, audit int8-vs-f32 greedy parity on device and fall back
        # to the f32 cache on divergence.  Skipped when the user forced
        # the choice (YOMITOKU_TPU_INT8_KV) or weights are random.
        if (
            self.model.int8_kv
            and self.model.pretrained_source is not None
            and not os.environ.get("YOMITOKU_TPU_INT8_KV")
            and not os.environ.get("YOMITOKU_TPU_SKIP_INT8_AUDIT")
        ):
            self.model.audit_int8_kv()
        if num_devices is not None:
            from .parallel import dp_mesh

            mesh = dp_mesh(num_devices)
            if mesh is not None:
                self.model.use_mesh(mesh)
        self.charset = load_charset(self._cfg.charset)
        self.tokenizer = Tokenizer(self.charset)

        self.device = device
        self.visualize = visualize
        self.rec_orientation_fallback = rec_orientation_fallback
        self.rec_orientation_fallback_thresh = rec_orientation_fallback_thresh

        # self-verifying width-bucket default (mirrors the int8-KV audit):
        # on first load of REAL params with the device-crop path active,
        # audit narrow-canvas greedy parity against the full canvas and
        # auto-enable the half-width bucket only when every string agrees.
        # Random weights keep buckets off (near-uniform logits make argmax
        # flip on the padding-token delta; see _width_buckets).
        self._auto_width_buckets = None
        if (
            self.model.pretrained_source is not None
            and not os.environ.get("YOMITOKU_TPU_REC_WIDTH_BUCKETS")
            and not os.environ.get("YOMITOKU_TPU_SKIP_WIDTH_AUDIT")
            and self._use_device_crops()
        ):
            self._auto_width_buckets = self.audit_width_buckets()

    def _default_width_buckets(self):
        full_w = int(self._cfg.data.img_size[1])
        pw = int(self.model.core.enc_patch_size[1])
        half = (full_w // 2) // pw * pw
        return [half] if 0 < half < full_w else None

    def audit_width_buckets(self):
        """Greedy-parity audit for the half-width recognizer bucket.

        Builds a synthetic page of lines at varied aspect ratios (wide,
        medium, near-bucket, vertical-rotated) whose aspect-preserved
        content widths all fit the candidate bucket, decodes them through
        the full-canvas and narrow-canvas programs, and enables the bucket
        only when every greedy string agrees.  The narrow crop is
        bit-identical to the left slice of the full crop; the only numeric
        delta is the absent black padding patches, whose effect this audit
        measures on the loaded weights instead of assuming."""
        buckets = self._default_width_buckets()
        if not buckets:
            return None
        import jax.numpy as jnp

        from .ops.device_crop import line_homographies, pad_page
        from .utils.logger import set_logger

        oh, ow = (int(x) for x in self._cfg.data.img_size)
        b = buckets[-1]
        rng = np.random.RandomState(0)
        h_line = min(10, oh)
        # (w_px, h_px) crops; shrink-only resize keeps content width = w_px
        # (rotated lines: = h_px) since every crop already fits the canvas
        shapes = [
            (max(1, int(f * b)), h_line) for f in (0.3, 0.55, 0.8, 1.0)
        ]
        shapes.append((max(1, min(6, int(0.2 * b))), max(1, int(0.8 * b))))
        page_w = max(w for w, _ in shapes) + 8
        page_h = sum(h + 4 for _, h in shapes) + 8
        page = np.full((page_h, page_w, 3), 255, np.uint8)
        quads, y = [], 4
        for w_px, h_px in shapes:
            page[y : y + h_px, 4 : 4 + w_px] = rng.randint(
                0, 255, (h_px, w_px, 3)
            )
            quads.append(
                [[4, y], [4 + w_px, y], [4 + w_px, y + h_px], [4, y + h_px]]
            )
            y += h_px + 4
        mats, wh = line_homographies(quads, (oh, ow))
        assert int(wh[:, 0].max()) <= b, "audit line exceeds the bucket"
        page_dev = jnp.asarray(pad_page(page))
        full_s, _ = self.tokenizer.decode_ids(
            *self.model.forward_tokens_from_page(page_dev, mats, wh)
        )
        narrow_s, _ = self.tokenizer.decode_ids(
            *self.model.forward_tokens_from_page(page_dev, mats, wh, out_w=b)
        )
        agree = sum(a == c for a, c in zip(full_s, narrow_s))
        if agree == len(full_s):
            set_logger(__name__).info(
                "recognizer width bucket w=%d enabled: narrow-canvas greedy "
                "audit matched the full canvas on all %d probes "
                "(YOMITOKU_TPU_REC_WIDTH_BUCKETS=0 to disable)",
                b,
                len(full_s),
            )
            return buckets
        set_logger(__name__).warning(
            "recognizer width bucket disabled: narrow-canvas greedy audit "
            "diverged from the full canvas on %d/%d probes "
            "(YOMITOKU_TPU_REC_WIDTH_BUCKETS=%d to force)",
            len(full_s) - agree,
            len(full_s),
            b,
        )
        return None

    def preprocess(self, img, polygons):
        if polygons is None:
            h, w = img.shape[:2]
            polygons = [[[0, 0], [w, 0], [w, h], [0, h]]]
        dataset = ParseqDataset(self._cfg, img, polygons)
        return dataset, polygons

    def _iter_minibatches(self, batch: np.ndarray):
        bs = self._cfg.data.batch_size
        for i in range(0, len(batch), bs):
            yield batch[i : i + bs]

    def _infer_padded(self, chunk: np.ndarray):
        """Pad chunk to a bucketed batch size, run the jitted program, and
        strip padding (keeps the compiled-program count small).  Returns
        device-reduced greedy (ids, probs) — only two (B, L) arrays cross
        the host boundary, not the (B, L, 7k) distributions."""
        n = len(chunk)
        target = bucket_batch_size(n, self._cfg.data.batch_size)
        if n < target:
            pad = np.zeros((target - n,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        ids, probs = self.model.forward_tokens(chunk)
        return ids[:n], probs[:n]

    def postprocess(self, ids_probs, points):
        preds, scores = self.tokenizer.decode_ids(*ids_probs)
        preds = [unicodedata.normalize("NFKC", x) for x in preds]

        directions = []
        for point in points:
            point = np.array(point)
            w = np.linalg.norm(point[0] - point[1])
            h = np.linalg.norm(point[1] - point[2])
            directions.append("vertical" if h > w * 2 else "horizontal")
        return preds, scores, directions

    def _run_batch_inference(self, batch: np.ndarray, points):
        preds, scores, directions = [], [], []
        offset = 0
        for chunk in self._iter_minibatches(batch):
            batch_points = points[offset : offset + len(chunk)]
            ids_probs = self._infer_padded(chunk)
            p, s, d = self.postprocess(ids_probs, batch_points)
            preds.extend(p)
            scores.extend(s)
            directions.extend(d)
            offset += len(chunk)
        return preds, scores, directions

    # ------------------------------------------------- device-crop path

    def _use_device_crops(self) -> bool:
        """Crop lines on device (one page upload + tiny homographies)
        instead of uploading a host-built crop batch — same gate as the
        rest of the pipeline (ops.device_crop.device_crops_enabled)."""
        from .ops.device_crop import device_crops_enabled

        return device_crops_enabled()

    def _infer_padded_page(self, page, mats, valid_wh, out_w=None):
        """Bucket-pad the homography batch and run the fused
        crop+decode program (models/parseq.py forward_tokens_from_page)."""
        n = len(mats)
        target = bucket_batch_size(n, self._cfg.data.batch_size)
        if n < target:
            pad = target - n
            # pad with IDENTITY maps, not zeros: a zero homography has a
            # degenerate bottom row, which would fail mats_separable and
            # silently kick the whole batch off the separable MXU crop
            # program (models/parseq.py forward_tokens_from_page)
            mats = np.concatenate(
                [mats, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))]
            )
            # zero extents mask the padded lanes to black crops
            valid_wh = np.concatenate([valid_wh, np.zeros((pad, 2), np.int32)])
        ids, probs = self.model.forward_tokens_from_page(
            page, mats, valid_wh, out_w=out_w
        )
        return ids[:n], probs[:n]

    def _width_buckets(self):
        """Recognizer width buckets — audited default (device-crop path).

        Routing is content-aware and never truncates: a line is sent to a
        narrower bucket only when its aspect-preserved resized content
        width (valid_wh[0], known at preprocess time) fits entirely, and
        the narrow crop is bit-identical to the left slice of the
        full-width crop (tests/test_rec_width_buckets.py).  The ViT
        slices its position-embedding grid to match.  The one numeric
        delta vs the reference's fixed 32x800 canvas
        (configs/cfg_text_recognizer_parseq.py:11) is the absent black
        padding patches — those DO participate in encoder attention, so
        narrow-canvas greedy strings are not identical-by-construction
        (measured: random weights flip argmax).  Hence the default is the
        load-time audit (audit_width_buckets): real checkpoints enable the
        half-width bucket automatically when greedy parity holds on the
        probe set; random weights keep buckets off.  ~2x encoder FLOPs
        saved at half canvas for short lines.

        YOMITOKU_TPU_REC_WIDTH_BUCKETS overrides: "0"/"off" disables,
        "400" or "256,512" forces explicit widths (patch-width multiples
        < full canvas) with no audit; unset = audited auto."""
        env = os.environ.get("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "").strip()
        if not env:
            return getattr(self, "_auto_width_buckets", None)
        if env.lower() in ("0", "off", "none", "false"):
            return None
        full_w = int(self._cfg.data.img_size[1])
        pw = int(self.model.core.enc_patch_size[1])
        buckets = []
        for tok in env.split(","):
            tok = tok.strip()
            if not tok:
                continue
            w = int(tok)
            if 0 < w < full_w and w % pw == 0:
                buckets.append(w)
        return sorted(set(buckets)) or None

    def _run_batch_inference_page(self, page, mats, valid_wh, points):
        """Content-aware width-bucket router (default on, see
        _width_buckets), then per-group crop-program routing."""
        buckets = self._width_buckets()
        if not buckets:
            return self._run_batch_inference_page_w(
                page, mats, valid_wh, points
            )
        n = len(mats)
        assign = []
        for i in range(n):
            w = int(valid_wh[i][0])
            assign.append(next((b for b in buckets if w <= b), None))
        groups = {}
        for i, b in enumerate(assign):
            groups.setdefault(b, []).append(i)
        if len(groups) == 1:
            (b,) = groups
            return self._run_batch_inference_page_w(
                page, mats, valid_wh, points, out_w=b
            )
        # cost guard: batch-bucket padding (_infer_padded_page) can make a
        # split SLOWER than one full-width dispatch (e.g. 64 narrow + 64
        # wide pads to 128@half + 128@full = 1.5x the work of 128@full).
        # Encoder cost ~ padded_batch * canvas_width; split only when the
        # routed schedule is strictly cheaper.
        full_w = int(self._cfg.data.img_size[1])

        def _padded_cost(count, width):
            bs = self._cfg.data.batch_size
            whole, rem = divmod(count, bs)
            cost = whole * bs * width
            if rem:
                cost += bucket_batch_size(rem, bs) * width
            return cost

        routed_cost = sum(
            _padded_cost(len(idx), b if b is not None else full_w)
            for b, idx in groups.items()
        )
        if routed_cost >= _padded_cost(n, full_w):
            return self._run_batch_inference_page_w(
                page, mats, valid_wh, points
            )
        preds, scores, directions = [None] * n, [None] * n, [None] * n
        for b, idx in groups.items():
            p, s, d = self._run_batch_inference_page_w(
                page, mats[idx], valid_wh[idx],
                [points[i] for i in idx], out_w=b,
            )
            for j, i in enumerate(idx):
                preds[i], scores[i], directions[i] = p[j], s[j], d[j]
        return preds, scores, directions

    def _run_batch_inference_page_w(self, page, mats, valid_wh, points,
                                    out_w=None):
        """Route each line to the right crop program, then decode in
        batch-bucket chunks.

        models/parseq.py picks the separable MXU crop program only when
        EVERY map in the batch is axis-(anti-)aligned, so one skewed
        minAreaRect quad (a rotated stamp on an otherwise digital page)
        would kick all ~100 lines onto the 163 ms gather.  Partition
        instead: aligned lines run separable, the rotated minority runs
        the gather in its own (small) bucket, and results merge back in
        input order — per-line decodes are batch-independent, so the
        split changes nothing semantically."""
        from .ops.separable_resize import mats_separable_mask

        n = len(mats)
        sep_mask = mats_separable_mask(mats)
        rot = [i for i in range(n) if not sep_mask[i]]
        if rot and len(rot) < n:
            sep = sorted(set(range(n)) - set(rot))
            preds, scores, directions = [None] * n, [None] * n, [None] * n
            for idx in (sep, rot):
                p, s, d = self._run_batch_chunks(
                    page, mats[idx], valid_wh[idx], [points[i] for i in idx],
                    out_w=out_w,
                )
                for j, i in enumerate(idx):
                    preds[i], scores[i], directions[i] = p[j], s[j], d[j]
            return preds, scores, directions
        return self._run_batch_chunks(page, mats, valid_wh, points,
                                      out_w=out_w)

    def _run_batch_chunks(self, page, mats, valid_wh, points, out_w=None):
        from .utils.stagetrace import segment

        preds, scores, directions = [], [], []
        bs = self._cfg.data.batch_size
        for i in range(0, len(mats), bs):
            ids_probs = self._infer_padded_page(
                page, mats[i : i + bs], valid_wh[i : i + bs], out_w=out_w
            )
            with segment("rec", "tokenize"):
                p, s, d = self.postprocess(ids_probs, points[i : i + bs])
            preds.extend(p)
            scores.extend(s)
            directions.extend(d)
        return preds, scores, directions

    def _apply_orientation_fallback_page(self, page, points, preds, scores,
                                         directions):
        """Device-path fallback: re-run low-confidence lines 180deg
        rotated by composing the flip into the crop homography (host path
        rotates the kept ROI with cv2.ROTATE_180)."""
        from .ops.device_crop import line_homographies

        retry_indices = [
            i
            for i, s in enumerate(scores)
            if s < self.rec_orientation_fallback_thresh
        ]
        if not retry_indices:
            return
        retry_points = [points[i] for i in retry_indices]
        mats, valid_wh = line_homographies(
            retry_points, tuple(self._cfg.data.img_size), rot180=True
        )
        r_preds, r_scores, r_dirs = self._run_batch_inference_page(
            page, mats, valid_wh, retry_points
        )
        for j, idx in enumerate(retry_indices):
            if (
                r_scores[j] > scores[idx]
                and r_scores[j] >= self.rec_orientation_fallback_thresh
            ):
                preds[idx] = r_preds[j]
                scores[idx] = r_scores[j]
                directions[idx] = r_dirs[j]

    def _call_device(self, img, points, page=None):
        """One page upload (or a shared, already-uploaded DevicePage);
        crops, normalization, and decode run as one device program per
        batch bucket."""
        import jax.numpy as jnp

        from .data.functions import validate_quads
        from .ops.device_crop import line_homographies, pad_page

        if points is None:
            h, w = img.shape[:2]
            points = [[[0, 0], [w, 0], [w, h], [0, h]]]

        def _nonzero_area(q):
            # host parity: ParseqDataset drops quads whose warped ROI is
            # empty (int-cast side length 0, data/dataset.py)
            qa = np.asarray(q, dtype=np.int64).astype(np.float64)
            return (
                int(np.linalg.norm(qa[0] - qa[1])) > 0
                and int(np.linalg.norm(qa[1] - qa[2])) > 0
            )

        from .utils.stagetrace import segment

        with segment("rec", "host_prep"):
            valid_points = [
                q
                for q in points
                if validate_quads(img, q) is not None and _nonzero_area(q)
            ]
            if not valid_points:
                return [], [], [], []
            mats, valid_wh = line_homographies(
                valid_points, tuple(self._cfg.data.img_size)
            )
        page = page.dev if page is not None else jnp.asarray(pad_page(img))
        preds, scores, directions = self._run_batch_inference_page(
            page, mats, valid_wh, valid_points
        )
        if self.rec_orientation_fallback:
            self._apply_orientation_fallback_page(
                page, valid_points, preds, scores, directions
            )
        return preds, scores, directions, valid_points

    def _apply_orientation_fallback(self, dataset, points, preds, scores, directions):
        retry_indices = [
            i
            for i, s in enumerate(scores)
            if s < self.rec_orientation_fallback_thresh
        ]
        if not retry_indices:
            return
        img_size = self._cfg.data.img_size
        crops = []
        for i in retry_indices:
            rotated = cv2.rotate(dataset.roi_images[i], cv2.ROTATE_180)
            crops.append(resize_with_padding(rotated, img_size))
        batch = np.stack(crops)  # uint8; normalized on device
        retry_points = [points[i] for i in retry_indices]
        r_preds, r_scores, r_dirs = self._run_batch_inference(batch, retry_points)
        for j, idx in enumerate(retry_indices):
            if (
                r_scores[j] > scores[idx]
                and r_scores[j] >= self.rec_orientation_fallback_thresh
            ):
                preds[idx] = r_preds[j]
                scores[idx] = r_scores[j]
                directions[idx] = r_dirs[j]

    def __call__(self, img, points=None, vis=None, page=None):
        """Recognize text lines in ``img`` at the given quads (BGR image)."""
        if self._use_device_crops():
            preds, scores, directions, valid_points = self._call_device(
                img, points, page
            )
        else:
            dataset, points = self.preprocess(img, points)
            valid_points = dataset.valid_quads
            batch = dataset.as_u8_array()
            preds, scores, directions = self._run_batch_inference(
                batch, valid_points
            )
            if self.rec_orientation_fallback:
                self._apply_orientation_fallback(
                    dataset, valid_points, preds, scores, directions
                )

        outputs = {
            "contents": preds,
            "scores": scores,
            "points": valid_points,
            "directions": directions,
        }
        results = TextRecognizerSchema(**outputs)

        if self.visualize:
            from .utils.visualizer import rec_visualizer

            if vis is None:
                vis = img.copy()
            vis = rec_visualizer(
                vis,
                results,
                font_size=self._cfg.visualize.font_size,
                font_color=tuple(self._cfg.visualize.color[::-1]),
                font_path=self._cfg.visualize.font,
            )
        return results, vis
