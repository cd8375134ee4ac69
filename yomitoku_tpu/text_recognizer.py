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
        """Opt-in recognizer width buckets (YOMITOKU_TPU_REC_WIDTH_BUCKETS,
        e.g. "400" or "256,512").  Lines whose content fits a narrower
        canvas run the encoder at that width — the crop is bit-identical
        to the left slice of the full-width crop and the ViT slices its
        position-embedding grid, but the model no longer sees the full
        800-px padded canvas the reference always feeds it, so outputs
        can differ from reference numerics.  Serving optimization for the
        encoder-bound recognizer (~2x encoder FLOPs at w=400); validate
        against real checkpoints before enabling in production."""
        env = os.environ.get("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "").strip()
        if not env:
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
        """Opt-in width-bucket router (see _width_buckets), then per-group
        crop-program routing."""
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
