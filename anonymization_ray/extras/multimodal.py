"""Multimodal column plumbing: opaque binary media + typed metadata.

Schema convention:
    media: binary            (opaque payload)
    media_meta: struct<mime: string, width: int32, height: int32,
                       duration_ms: int32>

What is REAL here (no external codecs needed):
- ``parse_image_header``: container-format metadata (PNG IHDR, JPEG SOF,
  GIF header) parsed straight from the payload bytes
- ``probe_media_meta``: the metadata-typing stage over a binary column
- grayscale 8-bit PNG encode/decode (``encode_png_gray`` /
  ``decode_png_gray``) — PNG filter-0 scanlines need only ``zlib``, so the
  actor-pool decode stage genuinely decodes PNG payloads to pixel arrays
- ``MediaDecoder``: actor-pool stage (state in ``__init__``, payload dropped
  after decode, small batches for MB-scale payloads)

Since round 4, BASELINE sequential grayscale JPEG also decodes FOR REAL —
the numpy-only codec in ``extras/jpeg.py`` (canonical Huffman + matrix DCT);
see that module for the closed-form oracle story.

Also REAL since round 4: mono 16-bit PCM WAV encode/decode
(``encode_wav_pcm16`` / ``decode_wav_pcm16`` — RIFF chunk walk + numpy
frombuffer, nothing but ``struct``) feeding the actor-pool audio statistics
stage (``decode_audio_stats``); and monochrome Y4M (YUV4MPEG2) video
encode/decode feeding the stride frame-sampling stage
(``sample_video_frames``) — Y4M is the uncompressed interchange format of
the ffmpeg/x264 toolchain, so the frame walk IS a complete decoder.

What is a STUB (clearly marked): decoding formats that require codecs absent
from this container (progressive/color JPEG, compressed/multi-channel audio,
compressed video H.26x/VP9/AV1 and chroma-subsampled Y4M) —
``MediaDecoder(fake=False)`` raises NotImplementedError for those;
``fake=True`` substitutes deterministic hash features so the plumbing is
exercisable for any payload.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_META_TYPE = pa.struct(
    [
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Minimal VALID grayscale 8-bit PNG (color type 0, filter 0 rows)."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes) -> np.ndarray:
    """Decode a filter-0 grayscale 8-bit PNG to (h, w) uint8 — pure
    python+zlib, no codec dependency."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise NotImplementedError("only 8-bit grayscale PNG decode")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    out = np.empty((h, w), dtype=np.uint8)
    stride = w + 1
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        if row[0] != 0:
            raise NotImplementedError("only filter-0 scanlines")
        out[r] = np.frombuffer(row[1:], dtype=np.uint8)
    return out


def parse_image_header(payload: bytes) -> dict | None:
    """(mime, width, height) from the container header — PNG / JPEG / GIF,
    no codec needed. None for unrecognized payloads."""
    if payload[:8] == _PNG_SIG and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return {"mime": "image/png", "width": w, "height": h, "duration_ms": 0}
    if payload[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
        pos = 2
        while pos + 9 < len(payload):
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"mime": "image/jpeg", "width": w, "height": h, "duration_ms": 0}
            pos += 2 + seg
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"mime": "image/gif", "width": w, "height": h, "duration_ms": 0}
    return None


def attach_media(
    ds: rd.Dataset, id_col: str, *, width: int = 32, height: int = 32
) -> rd.Dataset:
    """Deterministic REAL PNG payloads (id-seeded pixels) — the test corpus
    for the probe/decode stages; no image library involved."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = []
        for i in ids:
            seed = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            rng = np.random.Generator(np.random.Philox(key=seed))
            payloads.append(
                encode_png_gray(rng.integers(0, 256, (height, width), dtype=np.uint8))
            )
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


def attach_fake_media(
    ds: rd.Dataset, id_col: str, *, payload_bytes: int = 4096
) -> rd.Dataset:
    """Opaque deterministic payloads (NOT valid images) for exercising the
    fake-feature path and unknown-format handling."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = []
        metas = []
        for i in ids:
            seed = hashlib.md5(str(i).encode()).digest()
            payloads.append((seed * (payload_bytes // len(seed) + 1))[:payload_bytes])
            metas.append(
                {"mime": "application/octet-stream", "width": 0, "height": 0, "duration_ms": 0}
            )
        batch = batch.append_column("media", pa.array(payloads, pa.binary()))
        return batch.append_column("media_meta", pa.array(metas, MEDIA_META_TYPE))

    return ds.map_batches(_attach, batch_format="pyarrow")


def probe_media_meta(ds: rd.Dataset, *, payload_col: str = "media") -> rd.Dataset:
    """Fill/replace ``media_meta`` by parsing container headers (REAL —
    touches only header bytes, payload never copied)."""

    def _probe(batch: pa.Table) -> pa.Table:
        metas = []
        for p in batch.column(payload_col).to_pylist():
            m = parse_image_header(p or b"") or parse_wav_header(p or b"")
            metas.append(
                m or {"mime": "application/octet-stream", "width": 0, "height": 0, "duration_ms": 0}
            )
        if "media_meta" in batch.column_names:
            batch = batch.drop_columns(["media_meta"])
        return batch.append_column("media_meta", pa.array(metas, MEDIA_META_TYPE))

    return ds.map_batches(_probe, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool callable: decode + feature-extract media payloads.

    Real deployments load the codec/model once here (``__init__`` runs once
    per actor). PNG grayscale payloads decode FOR REAL (zlib-only path
    above); features are a deterministic ``feature_dim``-cell mean-pool grid
    over the pixels. Other formats: ``fake=True`` produces deterministic
    pseudo-features from the payload hash; ``fake=False`` raises
    NotImplementedError (JPEG entropy / audio / video decoding needs codecs
    not present in this container).
    """

    def __init__(self, *, fake: bool = True, feature_dim: int = 16) -> None:
        self._fake = fake
        self._dim = feature_dim
        # real version adds: self._model = load_model(...)

    def _png_features(self, px: np.ndarray) -> np.ndarray:
        g = int(np.sqrt(self._dim))
        g = max(1, g)
        h, w = px.shape
        feats = np.zeros(self._dim, dtype=np.float32)
        idx = 0
        for r in range(g):
            for c in range(g):
                if idx >= self._dim:
                    break
                cell = px[r * h // g : (r + 1) * h // g, c * w // g : (c + 1) * w // g]
                feats[idx] = float(cell.mean()) / 255.0 if cell.size else 0.0
                idx += 1
        return feats

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:8] == _PNG_SIG:
            try:
                return self._png_features(decode_png_gray(payload))
            except NotImplementedError:
                pass  # non-grayscale PNG falls through to the stub policy
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg_gray

            try:
                return self._png_features(decode_jpeg_gray(payload))
            except NotImplementedError:
                pass  # progressive/color JPEG falls through to the stub policy
        if not self._fake:
            raise NotImplementedError(
                "decode for this media format requires a codec not present "
                "in this environment; run with fake=True for plumbing tests"
            )
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * (self._dim * 8 // len(h) + 1))[: self._dim * 8], dtype=np.uint64)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("media").to_pylist()
        feats = [self._decode(p) for p in payloads]
        out = batch.drop_columns(["media"])  # payload never travels past decode
        return out.append_column(
            "media_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def decode_media(
    ds: rd.Dataset,
    *,
    fake: bool = True,
    feature_dim: int = 16,
    concurrency=(1, 4),
    batch_size: int = 64,  # small: payloads are MB-scale in real data
) -> rd.Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake, "feature_dim": feature_dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def attach_media_affine(
    ds: rd.Dataset, id_col: str, *, width: int = 16, height: int = 16
) -> rd.Dataset:
    """Deterministic REAL PNG payloads with CLOSED-FORM pixels
    (row-major ``pixel[j] = (id*31 + j*j) % 256``). Unlike the Philox corpus
    above, the pixel statistics are SQL-expressible, so the whole
    encode -> decode -> stats path gets a value-level DuckDB oracle instead
    of a rows-only check."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        j2 = (np.arange(width * height, dtype=np.int64) ** 2) % 256
        payloads = [
            encode_png_gray(
                ((int(i) * 31 + j2) % 256).astype(np.uint8).reshape(height, width)
            )
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


def attach_media_jpeg_flat(
    ds: rd.Dataset, id_col: str, *, width: int = 16, height: int = 16
) -> rd.Dataset:
    """Deterministic REAL JPEG payloads (baseline sequential grayscale,
    encoded by ``extras/jpeg.py``) whose 8x8 blocks are each a FLAT gray
    ``g_b = (id*37 + b*59) % 256`` (b = row-major block index). With the
    codec's DC quantizer of 24 a flat block reconstructs EXACTLY to
    ``clip(3*round((g-128)/3) + 128, 0, 255)`` — a closed form DuckDB can
    recompute, so the lossy-codec decode path still gets a value-level
    oracle (``multimodal_jpeg_stats``)."""
    from .jpeg import encode_jpeg_gray

    bh, bw = height // 8, width // 8

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            px = np.empty((height, width), dtype=np.uint8)
            for b in range(bh * bw):
                r, c = divmod(b, bw)
                px[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = (
                    int(i) * 37 + b * 59
                ) % 256
            payloads.append(encode_jpeg_gray(px))
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


class MediaStatsDecoder:
    """Actor-pool callable: REAL decode (pure-python zlib PNG path, or the
    numpy-only baseline JPEG codec in ``extras/jpeg.py``, dispatched on the
    payload magic) -> integer pixel statistics per payload. Same deployment
    shape as ``MediaDecoder`` (codec state would load once per actor in
    __init__); the MB-scale payload column is dropped after decode so only
    the narrow stats stream travels on."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_gray

        widths, heights, sums = [], [], []
        for p in batch.column("media").to_pylist():
            if p[:2] == b"\xff\xd8":
                px = decode_jpeg_gray(p)
            elif p[:2] == b"BM":
                px = decode_bmp_gray(p)
            elif p[:2] in (b"P5", b"P2"):
                px = decode_pgm_gray(p)
            else:
                px = decode_png_gray(p)
            h, w = px.shape
            widths.append(w)
            heights.append(h)
            sums.append(int(px.astype(np.int64).sum()))
        out = batch.drop_columns(["media"])
        out = out.append_column("width", pa.array(widths, pa.int64()))
        out = out.append_column("height", pa.array(heights, pa.int64()))
        return out.append_column("pixel_sum", pa.array(sums, pa.int64()))


def decode_media_stats(
    ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        MediaStatsDecoder,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class MediaResizer:
    """Actor-pool callable: REAL decode -> nearest-neighbor downsample by an
    integer factor (top-left anchor: keep pixel (f·y, f·x)) -> re-encode to
    a REAL PNG + integer stats of the RESIZED image. The deployment shape
    for thumbnail/feature-input pipelines: decode state per actor, small
    output batches, payload column replaced (never both held)."""

    def __init__(self, factor: int = 2) -> None:
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self._f = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_gray

        widths, heights, sums, payloads = [], [], [], []
        for p in batch.column("media").to_pylist():
            px = decode_jpeg_gray(p) if p[:2] == b"\xff\xd8" else decode_png_gray(p)
            small = px[:: self._f, :: self._f]
            h, w = small.shape
            widths.append(w)
            heights.append(h)
            sums.append(int(small.astype(np.int64).sum()))
            payloads.append(encode_png_gray(small))
        out = batch.drop_columns(["media"])
        out = out.append_column("out_width", pa.array(widths, pa.int64()))
        out = out.append_column("out_height", pa.array(heights, pa.int64()))
        out = out.append_column("resized_sum", pa.array(sums, pa.int64()))
        return out.append_column("media", pa.array(payloads, pa.binary()))


def resize_media(
    ds: rd.Dataset, *, factor: int = 2, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


# --------------------------------------------------------------------------
# audio: RIFF/WAVE PCM16 — pure struct+numpy, no codec dependency
# --------------------------------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal VALID mono 16-bit PCM WAV (RIFF + fmt + data chunks)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode mono 16-bit PCM WAV -> (int16 samples, sample_rate). Chunk walk
    over the RIFF container; compressed / non-16-bit / multi-channel WAV
    raises NotImplementedError (honest gate, same policy as the image
    codecs)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, codec, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            codec, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if codec is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if codec != 1 or channels != 1 or bits != 16:
        raise NotImplementedError("only mono 16-bit PCM WAV decode")
    return np.frombuffer(data, dtype="<i2"), int(rate)


def parse_wav_header(payload: bytes) -> dict | None:
    """(mime, duration_ms) from the RIFF header — metadata only, the data
    chunk is sized but never copied."""
    try:
        samples, rate = decode_wav_pcm16(payload)
    except (ValueError, NotImplementedError, struct.error):
        return None
    return {
        "mime": "audio/wav",
        "width": 0,
        "height": 0,
        "duration_ms": int(len(samples) * 1000 // rate) if rate else 0,
    }


def attach_media_wav(
    ds: rd.Dataset, id_col: str, *, n_samples: int = 800, rate: int = 8000
) -> rd.Dataset:
    """Deterministic REAL WAV payloads with CLOSED-FORM samples
    ``s[j] = ((id*13 + j*7) % 2001) - 1000`` (int16 range), so the whole
    encode -> actor-decode -> stats path gets a value-level DuckDB oracle
    (``multimodal_wav_stats``) like the PNG/JPEG corpora above."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(n_samples, dtype=np.int64)
        payloads = [
            encode_wav_pcm16(((int(i) * 13 + j * 7) % 2001 - 1000).astype(np.int16), rate)
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


class MediaAudioStatsDecoder:
    """Actor-pool callable: REAL WAV decode -> integer waveform statistics
    (n_samples, sample_rate, duration_ms, sum_abs, zero crossings). Payload
    dropped after decode; same deployment shape as the image stats stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, rates, durs, sabs, zcs = [], [], [], [], []
        for p in batch.column("media").to_pylist():
            samples, rate = decode_wav_pcm16(p)
            s = samples.astype(np.int64)
            ns.append(len(s))
            rates.append(rate)
            durs.append(int(len(s) * 1000 // rate) if rate else 0)
            sabs.append(int(np.abs(s).sum()))
            zcs.append(int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if len(s) > 1 else 0)
        out = batch.drop_columns(["media"])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int64()))
        out = out.append_column("duration_ms", pa.array(durs, pa.int64()))
        out = out.append_column("sum_abs", pa.array(sabs, pa.int64()))
        return out.append_column("zero_crossings", pa.array(zcs, pa.int64()))


def decode_audio_stats(
    ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        MediaAudioStatsDecoder,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


# --------------------------------------------------------------------------
# video: YUV4MPEG2 (Y4M) — real uncompressed video container (the format
# ffmpeg/x264 pipelines exchange); text header + raw frame planes, so a
# numpy frame walk IS a complete decoder. Monochrome (Cmono) frames here;
# compressed video (H.26x/VP9/AV1) stays honestly gated.
# --------------------------------------------------------------------------

def encode_y4m_gray(frames: np.ndarray, *, fps: int = 25) -> bytes:
    """Minimal VALID monochrome Y4M stream: (n, h, w) uint8 -> bytes."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    parts = [head]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[f].astype(np.uint8).tobytes())
    return b"".join(parts)


def decode_y4m_gray(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode monochrome Y4M -> ((n, h, w) uint8 frames, fps). Chroma-
    subsampled streams (C420 etc.) raise NotImplementedError — same honest
    gate policy as the image/audio codecs."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    fps = 25
    colorspace = "420"  # Y4M default when no C tag present
    for tok in payload[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            colorspace = tok[1:]
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if colorspace != "mono":
        raise NotImplementedError("only monochrome (Cmono) Y4M decode")
    frame_bytes = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        start = fnl + 1
        frames.append(
            np.frombuffer(payload[start : start + frame_bytes], dtype=np.uint8).reshape(h, w)
        )
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps


def attach_media_y4m(
    ds: rd.Dataset,
    id_col: str,
    *,
    n_frames: int = 12,
    width: int = 16,
    height: int = 16,
) -> rd.Dataset:
    """Deterministic REAL Y4M payloads with CLOSED-FORM pixels
    ``frame[f][j] = (id*17 + f*29 + j*3) % 256`` (j row-major), giving the
    encode -> frame-sample -> stats path a value-level DuckDB oracle
    (``multimodal_video_stats``)."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        f = np.arange(n_frames, dtype=np.int64)[:, None]
        j = np.arange(width * height, dtype=np.int64)[None, :]
        payloads = [
            encode_y4m_gray(
                ((int(i) * 17 + f * 29 + j * 3) % 256)
                .astype(np.uint8)
                .reshape(n_frames, height, width)
            )
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


class VideoFrameSampler:
    """Actor-pool callable: REAL Y4M decode -> stride frame-sampling ->
    integer per-payload statistics (n_frames, fps, frames_sampled, pixel sum
    over the sampled frames). The classic training-data video stage: decode
    once per actor-held codec state, keep every k-th frame, drop the payload
    so only the narrow feature stream travels on."""

    def __init__(self, *, stride: int = 3) -> None:
        self._stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        nfs, fpss, nss, sums = [], [], [], []
        for p in batch.column("media").to_pylist():
            frames, fps = decode_y4m_gray(p)
            sampled = frames[:: self._stride]
            nfs.append(frames.shape[0])
            fpss.append(fps)
            nss.append(sampled.shape[0])
            sums.append(int(sampled.astype(np.int64).sum()))
        out = batch.drop_columns(["media"])
        out = out.append_column("n_frames", pa.array(nfs, pa.int64()))
        out = out.append_column("fps", pa.array(fpss, pa.int64()))
        out = out.append_column("frames_sampled", pa.array(nss, pa.int64()))
        return out.append_column("sampled_pixel_sum", pa.array(sums, pa.int64()))


def sample_video_frames(
    ds: rd.Dataset, *, stride: int = 3, concurrency=(1, 4), batch_size: int = 32
) -> rd.Dataset:
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class MediaAHasher:
    """Actor-pool callable: REAL image decode -> 8x8 average-hash (aHash),
    the classic perceptual fingerprint for image near-dup detection. Cells
    are 2x2 integer pixel sums; bit_i = cell_i * 64 > total (all-integer, so
    the hash is engine-exact); the 64 bits split into (hash_hi, hash_lo)
    int64 halves to stay signed-safe. The payload column is dropped after
    decode — only the 16-byte fingerprint stream travels to the dedup."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_gray

        his, los = [], []
        for p in batch.column("media").to_pylist():
            px = decode_jpeg_gray(p) if p[:2] == b"\xff\xd8" else decode_png_gray(p)
            h, w = px.shape
            if h % 8 or w % 8:
                raise NotImplementedError(
                    "aHash path requires dimensions divisible by 8 "
                    "(general resampling needs an image library)"
                )
            cells = (
                px.astype(np.int64)
                .reshape(8, h // 8, 8, w // 8)
                .sum(axis=(1, 3))
                .reshape(64)
            )
            bits = (cells * 64 > cells.sum()).astype(np.uint64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            full = int((bits * weights).sum(dtype=np.uint64))
            his.append(full >> 32)
            los.append(full & 0xFFFFFFFF)
        out = batch.drop_columns(["media"])
        out = out.append_column("hash_hi", pa.array(his, pa.int64()))
        return out.append_column("hash_lo", pa.array(los, pa.int64()))


def ahash_media(
    ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        MediaAHasher,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


_PHASH_SCALE = 16384  # 2^14 fixed-point for the DCT basis


def phash_basis(n_freq: int = 8, n_pix: int = 16) -> np.ndarray:
    """Fixed-point DCT-II basis C[k,i] = round(SCALE·cos(π(2i+1)k/2N)).
    The rounding happens ONCE here; the SQL oracle embeds these exact
    integers as literals, so no engine ever re-derives a cosine."""
    k = np.arange(n_freq)[:, None]
    i = np.arange(n_pix)[None, :]
    return np.round(
        _PHASH_SCALE * np.cos(np.pi * (2 * i + 1) * k / (2 * n_pix))
    ).astype(np.int64)


class MediaPHasher:
    """Actor-pool callable: REAL image decode -> pHash (DCT perceptual
    hash) in FIXED-POINT integer arithmetic. Classic pHash takes the
    low-frequency 8x8 corner of the image's 2D DCT and thresholds each AC
    coefficient against their median — robust to brightness/contrast
    shifts aHash is blind to. Float DCTs are engine-specific; here the
    basis is a rounded int64 matrix (built once per actor), T = C·P·Cᵀ is
    exact int64 (|T| ≤ 2^44 at 16x16/255), the median is the 32nd order
    statistic of the 63 AC values, and bit_j = coeff_j > median — every
    step integer-exact and SQL-replicable. Payloads drop after decode."""

    def __init__(self) -> None:
        self._basis = phash_basis()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_gray

        his, los = [], []
        c = self._basis
        for p in batch.column("media").to_pylist():
            px = decode_jpeg_gray(p) if p[:2] == b"\xff\xd8" else decode_png_gray(p)
            if px.shape != (16, 16):
                raise NotImplementedError(
                    "pHash path is pinned to 16x16 inputs (general "
                    "resampling needs an image library)"
                )
            t = c @ px.astype(np.int64) @ c.T
            ac = t.reshape(64)[1:]  # drop DC
            med = np.sort(ac)[31]  # 32nd order statistic of 63
            bits = (ac > med).astype(np.uint64)
            weights = np.uint64(1) << np.arange(63, dtype=np.uint64)
            full = int((bits * weights).sum(dtype=np.uint64))
            his.append(full >> 32)
            los.append(full & 0xFFFFFFFF)
        out = batch.drop_columns(["media"])
        out = out.append_column("hash_hi", pa.array(his, pa.int64()))
        return out.append_column("hash_lo", pa.array(los, pa.int64()))


def phash_media(
    ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        MediaPHasher,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


# --------------------------------------------------------------------------
# BMP (BI_RGB 8-bit paletted) — the third real codec beside PNG and JPEG
# --------------------------------------------------------------------------

def encode_bmp_gray(pixels: np.ndarray) -> bytes:
    """Minimal VALID 8-bit paletted BMP (BI_RGB uncompressed, grayscale
    palette, the spec's bottom-up row order with 4-byte row padding)."""
    import struct

    h, w = pixels.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((g, g, g, 0)) for g in range(256))
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up per the BMP spec
        rows += pixels[y].tobytes() + b"\x00" * (stride - w)
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 2835, 2835, 256, 0
    )
    return header + info + palette + bytes(rows)


def decode_bmp_gray(payload: bytes) -> np.ndarray:
    """Decode an 8-bit BI_RGB paletted BMP to (h, w) uint8 via the
    grayscale palette — pure python + numpy, mirrors `decode_png_gray`'s
    honest-subset contract (anything else refuses loudly)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 8 or comp != 0 or h <= 0:
        raise NotImplementedError("only bottom-up 8-bit BI_RGB BMP decode")
    pal = np.frombuffer(payload, np.uint8, 256 * 4, 14 + size).reshape(256, 4)
    # honest-subset contract: a COLOR palette would decode silently wrong
    # through the blue channel — refuse unless the palette is grayscale
    if not ((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
        raise NotImplementedError("only grayscale-palette 8-bit BMP decode")
    gray = pal[:, 0]  # grayscale palette: B == G == R
    stride = (w + 3) & ~3
    data = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    return gray[data[::-1, :w]]  # un-flip to top-down


def attach_media_bmp(
    ds: rd.Dataset, id_col: str, *, width: int = 16, height: int = 16
) -> rd.Dataset:
    """Deterministic REAL BMP payloads with CLOSED-FORM pixels
    (row-major ``pixel[j] = (id*43 + 7*j) % 256``) — same oracle story as
    `attach_media_affine`, third container format."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        j = (7 * np.arange(width * height, dtype=np.int64)) % 256
        payloads = [
            encode_bmp_gray(
                ((int(i) * 43 + j) % 256).astype(np.uint8).reshape(height, width)
            )
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


# --------------------------------------------------------------------------
# netpbm PGM (P5) — fourth real image container: the simplest interchange
# format real vision corpora still carry (OpenCV/ImageMagick emit it)

def encode_pgm_gray(px: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM (P5, maxval 255): ASCII header + raw
    row-major bytes. Bit-deterministic (no compression)."""
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode("ascii") + px.astype(np.uint8).tobytes()


def decode_pgm_gray(payload: bytes) -> np.ndarray:
    """Binary PGM -> (h, w) uint8. Honest subset: P5 with maxval 255
    (P2 ASCII and 16-bit maxvals refuse loudly); ``#`` header comments
    handled per spec."""
    if payload[:2] == b"P2":
        raise NotImplementedError("only binary P5 PGM decode (P2 is ASCII)")
    if payload[:2] != b"P5":
        raise ValueError("not a PGM")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments running to end-of-line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while not payload[j:j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval-255 (8-bit) PGM decode")
    i += 1  # single whitespace after maxval, then raster
    return np.frombuffer(payload, np.uint8, w * h, i).reshape(h, w)


def attach_media_pgm(
    ds: rd.Dataset, id_col: str, *, width: int = 16, height: int = 16
) -> rd.Dataset:
    """Deterministic REAL PGM payloads with CLOSED-FORM pixels
    (row-major ``pixel[j] = (id*37 + 11*j) % 256``) — same oracle story as
    the PNG/JPEG/BMP attach stages, fourth container format."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        j = (11 * np.arange(width * height, dtype=np.int64)) % 256
        payloads = [
            encode_pgm_gray(
                ((int(i) * 37 + j) % 256).astype(np.uint8).reshape(height, width)
            )
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


# --------------------------------------------------------------------------
# stereo WAV + downmix — the canonical audio PREPROCESSING stage (speech
# corpora arrive multi-channel; models eat mono)

def encode_wav_pcm16_stereo(
    left: np.ndarray, right: np.ndarray, rate: int = 8000
) -> bytes:
    """Minimal VALID stereo (2-channel interleaved) 16-bit PCM WAV."""
    inter = np.empty(left.size + right.size, dtype="<i2")
    inter[0::2] = left.astype("<i2")
    inter[1::2] = right.astype("<i2")
    data = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16_stereo(payload: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Stereo 16-bit PCM WAV -> (left, right, rate). Same honest chunk walk
    as the mono decoder; anything but 2-channel PCM16 refuses."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, codec, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            codec, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if codec is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if codec != 1 or channels != 2 or bits != 16:
        raise NotImplementedError("only stereo 16-bit PCM WAV decode")
    inter = np.frombuffer(data, dtype="<i2")
    return inter[0::2], inter[1::2], int(rate)


def attach_media_wav_stereo(
    ds: rd.Dataset, id_col: str, *, n_samples: int = 800, rate: int = 8000
) -> rd.Dataset:
    """Deterministic REAL stereo WAV payloads with CLOSED-FORM channels
    ``l[j] = ((id*13 + 7j) % 2001) - 1000``,
    ``r[j] = ((id*17 + 5j) % 2001) - 1000`` — the oracle recomputes both
    channels and the downmix relationally."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(n_samples, dtype=np.int64)
        payloads = [
            encode_wav_pcm16_stereo(
                ((int(i) * 13 + 7 * j) % 2001) - 1000,
                ((int(i) * 17 + 5 * j) % 2001) - 1000,
                rate,
            )
            for i in ids
        ]
        return batch.append_column("media", pa.array(payloads, pa.binary()))

    return ds.map_batches(_attach, batch_format="pyarrow")


class AudioDownmixer:
    """Actor-pool callable: stereo decode -> mono downmix
    ``m[j] = floor((l[j] + r[j]) / 2)`` (floor division, replayable in SQL)
    -> integer stats of the DOWNMIXED signal. Payload column dropped after
    decode — only the narrow stats stream travels on."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, sums, rates = [], [], []
        for p in batch.column("media").to_pylist():
            left, right, rate = decode_wav_pcm16_stereo(p)
            mono = (left.astype(np.int64) + right.astype(np.int64)) // 2
            ns.append(len(mono))
            sums.append(int(mono.sum()))
            rates.append(rate)
        out = batch.drop_columns(["media"])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("mono_sum", pa.array(sums, pa.int64()))
        return out.append_column("rate", pa.array(rates, pa.int64()))


def downmix_audio_stats(
    ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        AudioDownmixer,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class TileExtractor:
    """Actor-pool callable: REAL decode (magic dispatch, same as
    `MediaStatsDecoder`) -> split the image into a grid of ``tile`` x
    ``tile`` patches -> one OUTPUT ROW PER TILE with its grid position and
    integer pixel sum — the patch-extraction stage a vision-training
    pipeline runs before encoding (images must divide evenly; ragged edges
    refuse loudly rather than silently pad)."""

    def __init__(self, tile: int = 8, id_col: str = "doc_id") -> None:
        self._t = tile
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_gray

        t = self._t
        ids_out, tys, txs, sums = [], [], [], []
        ids = batch.column(self._id).to_pylist()
        for i, p in zip(ids, batch.column("media").to_pylist()):
            if p[:2] == b"\xff\xd8":
                px = decode_jpeg_gray(p)
            elif p[:2] == b"BM":
                px = decode_bmp_gray(p)
            elif p[:2] in (b"P5", b"P2"):
                px = decode_pgm_gray(p)
            else:
                px = decode_png_gray(p)
            h, w = px.shape
            if h % t or w % t:
                raise NotImplementedError(
                    f"image {h}x{w} does not divide into {t}x{t} tiles — "
                    "resize first (ragged-edge padding is a policy choice, "
                    "not a default)"
                )
            # one reshape → per-tile sums, no Python loop over pixels
            g = px.astype(np.int64).reshape(h // t, t, w // t, t)
            ts = g.sum(axis=(1, 3))  # (rows of tiles, cols of tiles)
            for ty in range(h // t):
                for tx in range(w // t):
                    ids_out.append(i)
                    tys.append(ty)
                    txs.append(tx)
                    sums.append(int(ts[ty, tx]))
        return pa.table(
            {
                self._id: pa.array(ids_out, pa.int64()),
                "tile_y": pa.array(tys, pa.int64()),
                "tile_x": pa.array(txs, pa.int64()),
                "tile_sum": pa.array(sums, pa.int64()),
            }
        )


def extract_tiles(
    ds: rd.Dataset,
    *,
    tile: int = 8,
    id_col: str = "doc_id",
    concurrency=(1, 4),
    batch_size: int = 64,
) -> rd.Dataset:
    return ds.map_batches(
        TileExtractor,
        fn_constructor_kwargs={"tile": tile, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
