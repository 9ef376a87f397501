"""O11 decode actor pool: bytes → pixels → phash verify (+ features).

The multimodal stage (SURVEY.md §3.4 O11/O12): an actor-pool
``map_batches`` class whose ``__init__`` holds codec state (dispatch
tables, scratch config) once per actor, and whose ``__call__`` decodes
a batch of encoded images, recomputes the perceptual hash, verifies it
against the stored ``phash`` column (bit-exact — all sandbox codecs are
lossless; a lossy codec would switch this to the PSNR ≥ 40 dB check),
and emits compact per-image features instead of pixels (mean RGB,
brightness, phash_ok) so pixel payloads never cross a shuffle
(SURVEY.md §7.3.5).

Batch sizes stay small (images are KB–MB each); concurrency × num_cpus
sizes the pool (decode is pure-python → 1 CPU per actor).

``raster_to_vector`` is the O12 handoff: per-image bright-region
bounding boxes (threshold + row/col extents) → rect features that feed
the tiles side of the spatial join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels import codecs
from s2geometry_ray.kernels.phash import phash64_i64


class DecodeActor:
    def __init__(self, verify_phash: bool = True, with_boxes: bool = False,
                 box_threshold: int = 200):
        self.decoders = dict(codecs.DECODERS)  # per-actor codec state
        self.verify_phash = verify_phash
        self.with_boxes = with_boxes
        self.box_threshold = box_threshold

    def _boxes(self, pixels: np.ndarray) -> list:
        gray = pixels.astype(np.int32).sum(axis=2) // 3
        mask = gray >= self.box_threshold
        if not mask.any():
            return []
        ys, xs = np.nonzero(mask)
        return [{"y0": int(ys.min()), "y1": int(ys.max()),
                 "x0": int(xs.min()), "x1": int(xs.max())}]

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        stored = batch["phash"].to_numpy(zero_copy_only=False)
        n = len(data)
        mean_r = np.empty(n)
        mean_g = np.empty(n)
        mean_b = np.empty(n)
        ph = np.empty(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        boxes = []
        for i in range(n):
            pixels = self.decoders[fmts[i]](data[i])
            mean_r[i] = pixels[:, :, 0].mean()
            mean_g[i] = pixels[:, :, 1].mean()
            mean_b[i] = pixels[:, :, 2].mean()
            ph[i] = phash64_i64(pixels)
            ok[i] = (not self.verify_phash) or ph[i] == stored[i]
            if self.with_boxes:
                boxes.append(self._boxes(pixels))
        out = {
            "image_id": batch["image_id"],
            "caption": batch["caption"],
            "w": batch["w"],
            "h": batch["h"],
            "fmt": batch["fmt"],
            "phash": pa.array(ph, type=pa.int64()),
            "phash_ok": pa.array(ok),
            "mean_r": pa.array(mean_r),
            "mean_g": pa.array(mean_g),
            "mean_b": pa.array(mean_b),
        }
        if self.with_boxes:
            out["boxes"] = pa.array(boxes)
        return pa.table(out)


def decode_stage(ds, concurrency: int = 4, batch_size: int = 128,
                 with_boxes: bool = False):
    """Attach the decode actor pool to an images Dataset."""
    return ds.map_batches(
        DecodeActor,
        fn_constructor_kwargs=dict(with_boxes=with_boxes),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioFeatureActor:
    """Actor-pool audio decode + feature extraction: WAV bytes → integer
    features, verified against the stamped ``rms`` (the bit-exact decode
    invariant, audio flavor).  Same shape as DecodeActor: codec state in
    ``__init__``, vector of compact features out, payloads never leave
    the stage."""

    def __init__(self, verify_rms: bool = True):
        from s2geometry_ray.kernels import av

        self.av = av
        self.verify_rms = verify_rms

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        stored = batch["rms"].to_numpy(zero_copy_only=False)
        n = len(data)
        dur = np.empty(n, dtype=np.int64)
        rms = np.empty(n, dtype=np.int64)
        zc = np.empty(n, dtype=np.int64)
        cen = np.empty(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            pcm, rate = self.av.decode_wav(data[i])
            f = self.av.audio_features(pcm, rate)
            dur[i], rms[i] = f["duration_ms"], f["rms"]
            zc[i], cen[i] = f["zero_crossings"], f["centroid_hz"]
            ok[i] = (not self.verify_rms) or f["rms"] == stored[i]
        return pa.table({
            "audio_id": batch["audio_id"],
            "caption": batch["caption"],
            "duration_ms": pa.array(dur),
            "rms": pa.array(rms),
            "zero_crossings": pa.array(zc),
            "centroid_hz": pa.array(cen),
            "rms_ok": pa.array(ok),
        })


class VideoSampleActor:
    """Actor-pool frame sampling: VID1 bytes → one row per SAMPLED frame
    with resized-thumbnail features + phash; frame 0's phash verifies
    bit-exactly against the stamped ``phash0``.  Non-sampled frames'
    payloads are never decoded (length-prefix byte-range walk)."""

    def __init__(self, every: int = 4, thumb: int = 8):
        from s2geometry_ray.kernels import av

        self.av = av
        self.every = every
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from s2geometry_ray.kernels.phash import phash64_i64

        data = batch["bytes"].to_pylist()
        vids = batch["video_id"].to_pylist()
        stored = batch["phash0"].to_numpy(zero_copy_only=False)
        out_vid, out_frame, out_ph, out_mean, out_ok = [], [], [], [], []
        for i in range(len(data)):
            for fi, px in self.av.sample_frames(data[i], self.every):
                th = self.av.resize_area(px, self.thumb, self.thumb)
                ph = int(phash64_i64(px))
                out_vid.append(vids[i])
                out_frame.append(fi)
                out_ph.append(ph)
                out_mean.append(int(th.astype(np.int64).mean()))
                out_ok.append(fi != 0 or ph == int(stored[i]))
        return pa.table({
            "video_id": pa.array(out_vid, type=pa.string()),
            "frame_idx": pa.array(out_frame, type=pa.int64()),
            "phash": pa.array(out_ph, type=pa.int64()),
            "thumb_mean": pa.array(out_mean, type=pa.int64()),
            "phash0_ok": pa.array(out_ok, type=pa.bool_()),
        })


def thumb_features(pixels: np.ndarray, thumb: int) -> tuple:
    """(thumb_mean, mean_r, mean_g, mean_b) ints of the exact-box-average
    resized thumbnail — shared by ImageThumbActor (workers) and the gate
    oracle's driver-side recompute pin."""
    from s2geometry_ray.kernels.av import resize_area

    th = resize_area(pixels, thumb, thumb).astype(np.int64)
    return (int(th.mean()), int(th[:, :, 0].mean()),
            int(th[:, :, 1].mean()), int(th[:, :, 2].mean()))


class ImageThumbActor:
    """Actor-pool still-image RESIZE: decode → exact box-average
    thumbnail (kernels/av.resize_area) → integer channel features.
    Codec dispatch state lives in ``__init__`` (once per actor); the
    full-resolution pixels never leave the worker — only the tiny
    feature columns shuffle."""

    def __init__(self, thumb: int = 8):
        self.decoders = dict(codecs.DECODERS)
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = len(data)
        tm = np.empty(n, dtype=np.int64)
        tr = np.empty(n, dtype=np.int64)
        tg = np.empty(n, dtype=np.int64)
        tb = np.empty(n, dtype=np.int64)
        for i in range(n):
            pixels = self.decoders[fmts[i]](data[i])
            tm[i], tr[i], tg[i], tb[i] = thumb_features(pixels, self.thumb)
        return pa.table({
            "image_id": batch["image_id"],
            "fmt": batch["fmt"],
            "thumb_mean": pa.array(tm, type=pa.int64()),
            "thumb_r": pa.array(tr, type=pa.int64()),
            "thumb_g": pa.array(tg, type=pa.int64()),
            "thumb_b": pa.array(tb, type=pa.int64()),
        })


def image_thumb_stage(ds, thumb: int = 8, concurrency: int = 4,
                      batch_size: int = 128):
    return ds.map_batches(ImageThumbActor,
                          fn_constructor_kwargs=dict(thumb=thumb),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def audio_feature_stage(ds, concurrency: int = 4, batch_size: int = 256):
    return ds.map_batches(AudioFeatureActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def video_sample_stage(ds, every: int = 4, concurrency: int = 4,
                       batch_size: int = 64):
    return ds.map_batches(VideoSampleActor,
                          fn_constructor_kwargs=dict(every=every),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


# --- O44: deterministic image augmentation -----------------------------


def augment_pixels(pixels: np.ndarray, h64: int,
                   crop_num: int = 3, crop_den: int = 4) -> np.ndarray:
    """The augmentation chain shared by AugmentActor (workers) and the
    gate oracle's driver-side recompute: content-hash-keyed horizontal /
    vertical flip and 90° rotation (bits 0–2 of ``h64``), then a
    center crop to ``crop_num/crop_den`` of each side.  Deterministic —
    the same image augments identically on any worker, any run (a
    training pipeline must be able to REPLAY its augmentations)."""
    if h64 & 1:
        pixels = pixels[:, ::-1]
    if h64 & 2:
        pixels = pixels[::-1]
    if h64 & 4:
        pixels = np.rot90(pixels)
    h, w = pixels.shape[:2]
    ch = max(1, (h * crop_num) // crop_den)
    cw = max(1, (w * crop_num) // crop_den)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return np.ascontiguousarray(pixels[y0:y0 + ch, x0:x0 + cw])


def augment_features(pixels: np.ndarray, h64: int) -> tuple:
    """(aug_h, aug_w, aug_sum, aug_phash) of the augmented image —
    tiny integer columns; the full pixels never leave the worker."""
    from s2geometry_ray.kernels.phash import phash64_i64

    aug = augment_pixels(pixels, h64)
    return (aug.shape[0], aug.shape[1],
            int(aug.astype(np.int64).sum()), int(phash64_i64(aug)))


class AugmentActor:
    """Actor-pool deterministic augmentation: decode → hash-keyed
    flip/rotate/center-crop → integer features.  Codec dispatch state
    in ``__init__`` (once per actor)."""

    def __init__(self):
        self.decoders = dict(codecs.DECODERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from s2geometry_ray.sources.synth import _hash_u64

        ids = batch["image_id"].to_pylist()
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = len(data)
        ah = np.empty(n, dtype=np.int64)
        aw = np.empty(n, dtype=np.int64)
        asum = np.empty(n, dtype=np.int64)
        aph = np.empty(n, dtype=np.int64)
        for i in range(n):  # per-image loop is codec-inherent
            h64 = _hash_u64(ids[i], "aug")
            ah[i], aw[i], asum[i], aph[i] = augment_features(
                self.decoders[fmts[i]](data[i]), h64)
        return pa.table({
            "image_id": batch["image_id"],
            "aug_h": pa.array(ah), "aug_w": pa.array(aw),
            "aug_sum": pa.array(asum), "aug_phash": pa.array(aph),
        })


def augment_stage(ds, concurrency: int = 4, batch_size: int = 128):
    return ds.map_batches(AugmentActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


class GeoColorActor:
    """Composed image×geo feature stage: decode (per-actor codec state)
    → exact integer per-channel pixel sums, plus the image's geotag
    derived from image_id (the north-star 'keyed by per-image geotag
    points' contract).  Integer sums — not float means — so downstream
    per-tile aggregation is order-insensitive-exact."""

    def __init__(self):
        self.decoders = dict(codecs.DECODERS)
        from s2geometry_ray.sources.synth import derive_latlng

        self._geotag = derive_latlng

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        n = len(data)
        sums = np.empty((n, 3), dtype=np.int64)
        lat = np.empty(n)
        lng = np.empty(n)
        for i in range(n):
            pixels = self.decoders[fmts[i]](data[i]).astype(np.int64)
            sums[i] = pixels.sum(axis=(0, 1))
            lat[i], lng[i] = self._geotag(ids[i])
        return pa.table({
            "image_id": batch["image_id"],
            "lat": pa.array(lat), "lng": pa.array(lng),
            "r_sum": pa.array(sums[:, 0], type=pa.int64()),
            "g_sum": pa.array(sums[:, 1], type=pa.int64()),
            "b_sum": pa.array(sums[:, 2], type=pa.int64()),
        })


class CurateActor:
    """Image-curation feature stage: decode (per-actor codec state) →
    recomputed phash VERIFIED against the stored stamp (raises on any
    codec/hash drift — the north-star per-row invariant), integer
    milli-brightness, id-derived geotag, and the integer image key.
    Emits only small typed features; pixels never leave the actor."""

    def __init__(self):
        self.decoders = dict(codecs.DECODERS)
        from s2geometry_ray.sources.synth import derive_latlng

        self._geotag = derive_latlng

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        stored = batch["phash"].to_numpy(zero_copy_only=False)
        n = len(data)
        ikey = np.empty(n, dtype=np.int64)
        ph = np.empty(n, dtype=np.int64)
        bmilli = np.empty(n, dtype=np.int64)
        lat = np.empty(n)
        lng = np.empty(n)
        for i in range(n):
            pixels = self.decoders[fmts[i]](data[i])
            ph[i] = phash64_i64(pixels)
            if ph[i] != stored[i]:
                raise ValueError(f"phash verify failed for {ids[i]}")
            s = int(pixels.astype(np.int64).sum())
            bmilli[i] = s * 1000 // (3 * pixels.shape[0] * pixels.shape[1])
            ikey[i] = int(ids[i][3:])
            lat[i], lng[i] = self._geotag(ids[i])
        return pa.table({
            "ikey": pa.array(ikey), "phash": pa.array(ph),
            "bmilli": pa.array(bmilli),
            "lat": pa.array(lat), "lng": pa.array(lng),
        })


class PatchActor:
    """O58 ViT-style patchify: decode → fixed P×P grid of patches per
    image (integer box edges floor(i·h/P)) → one row per patch with
    exact integer channel sums + pixel count.  The downstream embedding
    step would consume patches; here the engine emits the exact sums so
    the gate can pin every patch value (pixels never leave the actor)."""

    def __init__(self, grid: int = 4):
        self.decoders = dict(codecs.DECODERS)
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        P = self.grid
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        ikey, py, px, psum, npix = [], [], [], [], []
        for i in range(len(data)):
            pixels = self.decoders[fmts[i]](data[i]).astype(np.int64)
            h, w = pixels.shape[:2]
            k = int(ids[i][3:])
            ye = [y * h // P for y in range(P + 1)]
            xe = [x * w // P for x in range(P + 1)]
            for yy in range(P):
                for xx in range(P):
                    blk = pixels[ye[yy]:ye[yy + 1], xe[xx]:xe[xx + 1]]
                    ikey.append(k)
                    py.append(yy)
                    px.append(xx)
                    psum.append(int(blk.sum()))
                    npix.append(blk.shape[0] * blk.shape[1])
        return pa.table({
            "ikey": pa.array(ikey, type=pa.int64()),
            "py": pa.array(py, type=pa.int64()),
            "px": pa.array(px, type=pa.int64()),
            "psum": pa.array(psum, type=pa.int64()),
            "npix": pa.array(npix, type=pa.int64()),
        })
