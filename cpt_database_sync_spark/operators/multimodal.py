"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's closest concept is VARBINARY→Slice (`sync/
StandardReadMappings.java:107-109`, DDL `mediumblob` at
`sync/M2H2SchemaConverter.java:190`): bytes in, bytes out, no
interpretation. This module keeps that contract at the storage layer
(BinaryType column + metadata struct) and adds the processing plumbing a
training-data pipeline needs: decode / feature-extract / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Decoding is REAL where stdlib can carry it: ``decode_image_meta`` parses
PNG/JPEG/GIF container headers directly, and ``decode_image`` fully
decodes PNG (zlib inflate + scanline unfiltering), GIF (LZW + palette,
incl. interlacing) and both baseline AND progressive JPEG (huffman +
dequant + IDCT, multi-scan successive approximation, ``jpegcodec.py``)
pixels, with PIL as the fast path when installed — only exotic
payloads (WebP, arithmetic-coded JPEG, …) without a codec library
raise NotImplementedError. ``multimodal_meta`` additionally
keeps a clearly-marked deterministic fake decoder to exercise the
plumbing against arbitrary (non-image) payloads; schema, binary
handling, batch iteration, and partition parallelism are oracle-tested
throughout.

Scale notes: binary payloads ride the columnar format untouched (parquet
keeps them page-compressed); metadata extraction is map-only (no shuffle);
decode parallelism = #partitions. For 100 TB of media, set
``spark.sql.files.maxPartitionBytes`` so a partition's decoded batch fits
executor memory, and select the binary column last (column pruning keeps
metadata-only queries from reading the blobs at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import load


def _probe_pil():
    """Runtime codec probe: PIL when installed (real clusters), else None
    (this sandbox). Cached import, not a hard dependency."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # IHDR color type → channels


def decode_image_meta(payload: bytes) -> dict:
    """Real image metadata decode: (width, height, channels, fmt).

    Uses PIL when present; otherwise parses the container headers
    directly (PNG IHDR, JPEG SOFn, GIF logical screen descriptor) with
    pure stdlib — so metadata extraction is real even codec-less, and
    only PIXEL decoding needs a library. Raises ValueError on payloads
    that are not a recognized image."""
    import struct  # noqa: PLC0415

    pil = _probe_pil()
    if pil is not None:
        import io  # noqa: PLC0415

        with pil.open(io.BytesIO(payload)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "channels": len(im.getbands()),
                "fmt": (im.format or "unknown").lower(),
            }
    if payload[:8] == _PNG_MAGIC and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return {
            "width": w,
            "height": h,
            "channels": _PNG_CHANNELS.get(color_type, 3),
            "fmt": "png",
        }
    if payload[:3] == b"\xff\xd8\xff":  # JPEG: scan for a SOFn marker
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {
                    "width": w,
                    "height": h,
                    "channels": payload[i + 9],
                    "fmt": "jpeg",
                }
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        raise ValueError("JPEG payload has no SOF frame header")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"width": w, "height": h, "channels": 3, "fmt": "gif"}
    raise ValueError("unrecognized image container")


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_pixels(payload: bytes) -> dict:
    """Full PNG pixel decode in pure stdlib: IDAT zlib-inflate + scanline
    unfiltering (all five filter types: None/Sub/Up/Average/Paeth).

    Supports the non-interlaced 8-bit color types (grayscale, RGB,
    gray+alpha, RGBA) — the shapes a training pipeline's synthesized or
    screenshot-like PNGs use. Returns width/height/channels/fmt plus the
    raw ``pixels`` bytes (row-major, channel-interleaved)."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", payload[16:24])
    bit_depth, color_type, _, _, interlace = payload[24:29]
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported")
    if color_type not in (0, 2, 4, 6):
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    if interlace:
        raise NotImplementedError("Adam7 interlacing unsupported")
    channels = _PNG_CHANNELS[color_type]
    # walk chunks, concatenating IDAT payloads
    idat, i = b"", 8
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        if tag == b"IDAT":
            idat += payload[i + 8 : i + 8 + length]
        if tag == b"IEND":
            break
        i += 12 + length
    raw = zlib.decompress(idat)
    stride = w * channels
    bpp = channels  # bytes per pixel at 8-bit depth
    out = bytearray(h * stride)
    prior = bytes(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "fmt": "png",
        "pixels": bytes(out),
    }


def _gif_lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF-flavor LZW (GIF89a spec appendix F): variable code width
    starting at min_code_size+1 growing to 12 bits, CLEAR resets the
    table, EOI terminates. Returns the palette-index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = nbits = pos = 0

    def read_code(width: int) -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh_table():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[len(table) + 2] = prev + entry[:1]
        elif code == len(table) + 2:  # the KwKwK case
            entry = prev + prev[:1]
            table[code] = entry
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        # grow code width when the NEXT index would overflow it (12 max)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return out


def decode_gif_pixels(payload: bytes) -> dict:
    """First-frame GIF pixel decode in pure stdlib: logical screen
    descriptor + color table + LZW-compressed index stream → row-major
    RGB bytes. Handles local color tables and 4-pass interlacing; frames
    smaller than the logical screen are composited onto the background
    color (animation disposal/overlay beyond frame 1 is out of scope for
    a training-data still-image pipeline)."""
    import struct  # noqa: PLC0415

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    bg_index = payload[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[i : i + 3 * n]
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[i + 1 : i + 9])
        fpacked = payload[i + 9]
        i += 10
        ct = gct
        if fpacked & 0x80:  # local color table
            n = 2 << (fpacked & 0x07)
            ct = payload[i : i + 3 * n]
            i += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[i]
        i += 1
        data = bytearray()
        while payload[i] != 0:
            ln = payload[i]
            data += payload[i + 1 : i + 1 + ln]
            i += 1 + ln
        idx = _gif_lzw_decode(min_code_size, bytes(data))
        if len(idx) < fw * fh:
            raise ValueError("GIF LZW stream shorter than frame")
        if fpacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinterlaced = bytearray(fw * fh)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, fh, step):
                    deinterlaced[y * fw : (y + 1) * fw] = idx[src : src + fw]
                    src += fw
            idx = deinterlaced
        import numpy as np  # noqa: PLC0415

        # background index refers to the GLOBAL color table (the logical
        # screen descriptor's), never a frame-local one; an out-of-range
        # index (legal-but-meaningless in the wild) falls back to black
        # instead of silently producing a short pixel buffer
        if gct is not None and 3 * bg_index + 3 <= len(gct):
            bg = gct[3 * bg_index : 3 * bg_index + 3]
        else:
            bg = b"\0\0\0"
        # vectorized palette lookup + composite (this runs on executors
        # inside the Arrow decode lane; a per-pixel Python loop was ~100x
        # slower on large frames). Out-of-range pixel indices raise — a
        # corrupt stream, same contract as the LZW decoder.
        pal = np.frombuffer(bytes(ct), np.uint8)
        pal = pal[: 3 * (len(pal) // 3)].reshape(-1, 3)
        idx_arr = np.frombuffer(bytes(idx[: fw * fh]), np.uint8).reshape(fh, fw)
        if int(idx_arr.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        screen = np.empty((sh, sw, 3), np.uint8)
        screen[:] = np.frombuffer(bg, np.uint8)
        # clip frames extending past the logical screen (wild GIFs from
        # buggy encoders declare this; PIL clips, so the pure path must
        # match rather than raise a numpy broadcast error)
        fh_c = min(fh, sh - top)
        fw_c = min(fw, sw - left)
        if fh_c > 0 and fw_c > 0:
            screen[top : top + fh_c, left : left + fw_c] = pal[
                idx_arr[:fh_c, :fw_c]
            ]
        return {
            "width": sw,
            "height": sh,
            "channels": 3,
            "fmt": "gif",
            "pixels": screen.tobytes(),
        }
    raise ValueError("GIF contains no image frame")


def decode_image(payload: bytes) -> dict:
    """Full pixel decode: PIL when installed (any format), else the pure
    stdlib decoders — PNG (zlib + scanline unfiltering), GIF (LZW), and
    baseline + progressive JPEG (huffman + dequant + IDCT, multi-scan
    successive approximation) — so the pixel path is REAL in this
    sandbox for the three dominant container formats. Only exotic
    payloads (WebP, arithmetic-coded JPEG, …) without a codec library
    raise. Returns width/height/channels/fmt plus row-major ``pixels``
    bytes."""
    pil = _probe_pil()
    if pil is not None:
        import io  # noqa: PLC0415

        with pil.open(io.BytesIO(payload)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "channels": len(im.getbands()),
                "fmt": (im.format or "unknown").lower(),
                "pixels": im.tobytes(),
            }
    if payload[:8] == _PNG_MAGIC:
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from cpt_database_sync_spark.operators.jpegcodec import (  # noqa: PLC0415
            decode_jpeg_pixels,
        )

        return decode_jpeg_pixels(payload)
    raise NotImplementedError(
        "pixel decoding for this container needs PIL/libjpeg "
        "(not installed); decode_image_meta works codec-less"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for decode: metadata derived purely from the
    byte content (stable across engines and runs)."""
    n = len(payload)
    width = 64 + (n % 640)
    height = 64 + ((n * 7) % 480)
    channels = 1 + (n % 3)
    fmt = ("png", "jpeg", "webp")[n % 3]
    return n, width * height * channels, width, fmt


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the opaque media column: utf-8 bytes of the text stand in
    for an encoded image; schema is exactly what a real media table has.

    The repartition matters: the fixture is one parquet file (one input
    split), which would serialize every downstream Python decode worker;
    real media tables arrive in many splits and decode fans out naturally.
    """
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT
      doc_id,
      octet_length(encode(text))                              AS n_bytes,
      CAST(64 + octet_length(encode(text)) % 640 AS INT)      AS width,
      CAST(64 + (octet_length(encode(text)) * 7) % 480 AS INT) AS height,
      CAST(1 + octet_length(encode(text)) % 3 AS INT)         AS channels,
      CASE octet_length(encode(text)) % 3
        WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        WHEN 2 THEN 'webp' END                                AS fmt
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: synthesize payloads, run the
    (stubbed) decoder via mapInPandas over Arrow batches, emit typed
    metadata. The oracle recomputes the deterministic fake-decode in SQL —
    verifying the binary round-trip byte counts and the UDF plumbing."""
    media = with_binary_payload(load(spark, sf_dir, "documents"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (missing media cell — routine in a 100 TB
            # corpus) → metadata row with NULL fields, matching the
            # oracle's NULL-propagating octet_length arithmetic
            metas = [
                fake_decode_meta(p) if p is not None else (None,) * 4
                for p in pdf["payload"]
            ]
            ns = [m[0] for m in metas]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": ns,
                    "width": [64 + (n % 640) if n is not None else None for n in ns],
                    "height": [64 + ((n * 7) % 480) if n is not None else None for n in ns],
                    "channels": [1 + (n % 3) if n is not None else None for n in ns],
                    "fmt": [("png", "jpeg", "webp")[n % 3] if n is not None else None for n in ns],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, n_bytes int, width int, height int, "
            "channels int, fmt string"
        ),
    )


def png_pixel(x: int, y: int, seed: int = 0) -> int:
    """The deterministic grayscale test pattern baked into make_png —
    shared with the SQL oracle, which recomputes it symbolically."""
    return (x * 31 + y * 17 + seed) % 256


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal VALID grayscale PNG (8-bit) — stdlib only. Pixels carry
    the ``png_pixel`` pattern and each scanline is stored with filter
    type ``y % 5``, so decoding exercises every PNG filter
    (None/Sub/Up/Average/Paeth), not just the trivial path."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prior = bytes(width)
    for y in range(height):
        row = bytes(png_pixel(x, y, seed) for x in range(width))
        ft = y % 5
        filt = bytearray(width)
        for x in range(width):
            a = row[x - 1] if x >= 1 else 0  # left (bpp=1: grayscale)
            b = prior[x]  # up
            c = prior[x - 1] if x >= 1 else 0  # up-left
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            filt[x] = (row[x] - pred) & 0xFF
        raw += bytes([ft]) + bytes(filt)
        prior = row
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 1))
        + chunk(b"IEND", b"")
    )


@register(
    "multimodal_image_decode",
    # The oracle recomputes the png_pixel pattern symbolically: the Spark
    # side's pixel sum comes from REAL decoded bytes (zlib inflate +
    # unfilter, or PIL), so a decoder bug of even one pixel hash-fails.
    oracle="""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id, n, 1 + n % 64 AS w, 1 + (n * 3) % 48 AS h FROM d
    )
    SELECT doc_id,
           CAST(w AS INT)  AS width,
           CAST(h AS INT)  AS height,
           CAST(1 AS INT)  AS channels,
           'png'           AS fmt,
           round(CAST(SUM(((u.i % w) * 31 + (u.i // w) * 17 + n) % 256)
                      AS DOUBLE) / (w * h), 6) AS mean_px
    FROM dims, UNNEST(range(w * h)) AS u(i)
    GROUP BY doc_id, n, w, h
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: synthesize a valid PNG per document
    (dimensions and pixel pattern derived from the text's byte length,
    scanlines stored with all five PNG filter types), then decode it with
    ``decode_image`` — PIL when installed, pure-stdlib zlib-inflate +
    scanline unfiltering otherwise — and reduce the DECODED pixels to a
    mean-value statistic. The oracle recomputes dimensions and the pixel
    pattern symbolically, closing the loop: encode → real bytes → real
    pixel decode → verified values (division and rounding stay JVM-side
    for engine parity). Map-only Arrow batches; at 100 TB the payloads
    arrive from storage instead of the synthesizer and the rest of the
    stage is unchanged."""
    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    src = d.select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )

    def encode_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL text → no payload to synthesize/decode → no row, the
            # oracle's range(NULL w*h) produces the same absence
            pairs = [
                (d, int(n)) for d, n in zip(pdf["doc_id"], pdf["n"])
                if not pd.isna(n)  # int column with nulls arrives as NaN
            ]
            pdf = pd.DataFrame(
                {"doc_id": [p[0] for p in pairs], "n": [p[1] for p in pairs]}
            )
            metas = [
                decode_image(make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n))
                for n in pdf["n"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "fmt": [m["fmt"] for m in metas],
                    "px_sum": [sum(m["pixels"]) for m in metas],
                }
            )

    decoded = src.mapInPandas(
        encode_decode,
        schema=(
            "doc_id bigint, width int, height int, channels int, "
            "fmt string, px_sum bigint"
        ),
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "channels",
        "fmt",
        F.round(
            F.col("px_sum").cast("double") / (F.col("width") * F.col("height")), 6
        ).alias("mean_px"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT
      doc_id,
      CAST(u.i AS INT) AS frame_idx,
      substr(hex(b), CAST(u.i AS INT) * 200 + 1, 32) AS frame_hex
    FROM (SELECT doc_id, encode(text) AS b FROM documents) t,
         UNNEST(range(greatest(1, octet_length(t.b) // 100))) AS u(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video analogue): each payload expands to
    ~1 row per 100 bytes — the N-in/M-out mapInPandas shape a video
    frame-sampler has. Frame 'content' is a deterministic 16-byte slice
    per 100-byte stride (surfaced as hex: raw binary breaks the driver's
    pandas canonicalization), so the whole sampling grid is exactly
    SQL-expressible; a real pipeline would decode and resize in its
    place, same dataflow."""
    media = with_binary_payload(load(spark, sf_dir, "documents"))

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # missing media: one frame slot, no content — the
                    # oracle's greatest(1, NULL)=1 and hex(NULL)=NULL
                    out_ids.append(doc_id)
                    out_idx.append(0)
                    out_frames.append(None)
                    continue
                n_frames = max(1, len(payload) // 100)
                for i in range(n_frames):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(
                        bytes(payload[i * 100 : i * 100 + 16]).hex().upper()
                    )
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_hex": out_frames}
            )

    return media.select("doc_id", "payload").mapInPandas(
        sample_frames, schema="doc_id bigint, frame_idx int, frame_hex string"
    )


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH sig AS (
      SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS st
      FROM documents
    )
    SELECT doc_id,
           CAST(u.i // 50 AS INT) AS window_idx,
           CAST(SUM(ascii(substr(st, CAST(u.i + 1 AS INT), 1))) AS BIGINT)
             AS energy,
           CAST(MAX(ascii(substr(st, CAST(u.i + 1 AS INT), 1))) AS INT)
             AS peak
    FROM sig, UNNEST(range(length(st))) AS u(i)
    GROUP BY doc_id, u.i // 50
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-feature plumbing: windowed energy/peak over a PCM-like
    signal — the payload's bytes stand in for 8-bit samples (a real
    pipeline decodes with libsndfile in the same spot; the dataflow is
    identical).

    The signal is the ASCII-sanitized text's bytes (non-ASCII chars →
    '?'), so the Spark side's byte view and the oracle's per-character
    ascii() view are the same sequence for ANY corpus — without the
    sanitize, one multi-byte UTF-8 char would shift every later window.
    numpy does the windowed reduction vectorized per Arrow batch
    (``frombuffer`` — no per-sample Python loop); all arithmetic is
    integer, hence exact. Map-only: feature rows ~ n_bytes/50 per doc,
    no shuffle at any scale.
    """
    import numpy as np

    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    media = d.select(
        "doc_id",
        F.encode(
            F.regexp_replace("text", r"[^\x00-\x7F]", "?"), "utf-8"
        ).alias("payload"),
    )
    WIN = 50

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies, peaks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # no signal, no windows (oracle: range(NULL))
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                for w in range((len(arr) + WIN - 1) // WIN):
                    seg = arr[w * WIN : (w + 1) * WIN]
                    ids.append(doc_id)
                    idxs.append(w)
                    energies.append(int(seg.sum()))
                    peaks.append(int(seg.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": idxs,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        energy_batches,
        schema="doc_id bigint, window_idx int, energy bigint, peak int",
    )


RESIZE_W, RESIZE_H = 16, 12


@register(
    "multimodal_image_resize",
    # symbolic oracle over the REAL decode + resize: the Spark side sums
    # pixels selected by numpy nearest-neighbor indexing from the decoded
    # bytes; the oracle replays the same floor-scaled sampling grid over
    # the synthetic pixel pattern — one wrong sampled pixel hash-fails.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id, n, 1 + n % 64 AS w, 1 + (n * 3) % 48 AS h FROM d
    )
    SELECT doc_id,
           CAST({RESIZE_W} AS INT) AS out_w,
           CAST({RESIZE_H} AS INT) AS out_h,
           round(CAST(SUM((((u.i % {RESIZE_W}) * w // {RESIZE_W}) * 31
                           + ((u.i // {RESIZE_W}) * h // {RESIZE_H}) * 17
                           + n) % 256) AS DOUBLE)
                 / {RESIZE_W * RESIZE_H}, 6) AS mean_resized
    FROM dims, UNNEST(range({RESIZE_W * RESIZE_H})) AS u(i)
    GROUP BY doc_id, n, w, h
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE on the real pixel path — the preprocessing step a
    vision-data pipeline runs on every sample: decode the synthesized
    PNG (``decode_image``: PIL fast path or pure-stdlib inflate +
    unfilter), then nearest-neighbor resize to a fixed
    {RESIZE_W}x{RESIZE_H} grid with vectorized numpy index sampling
    (x = X*w//OUT_W — the floor-scaled grid), reducing to the resized
    mean. Map-only Arrow batches, one Python stage; the oracle replays
    the identical sampling arithmetic symbolically, so the decode, the
    grid, and the reduction are all value-checked.
    """
    import numpy as np  # noqa: PLC0415

    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    src = d.select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(RESIZE_W)
        ys = np.arange(RESIZE_H)
        sums = []
        ids = []
        for pdf in batches:
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                if pd.isna(n):  # int column with nulls arrives as NaN
                    # missing media: the row survives with a NULL mean
                    # (oracle: constant-range grid over NULL pattern)
                    ids.append(int(doc_id))
                    sums.append(None)
                    continue
                n = int(n)
                m = decode_image(make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n))
                arr = np.frombuffer(bytes(m["pixels"]), dtype=np.uint8).reshape(
                    m["height"], m["width"]
                )
                grid = arr[np.ix_((ys * m["height"]) // RESIZE_H,
                                  (xs * m["width"]) // RESIZE_W)]
                ids.append(int(doc_id))
                sums.append(int(grid.sum()))
            yield pd.DataFrame({"doc_id": ids, "rs_sum": sums})
            ids, sums = [], []

    resized = src.mapInPandas(
        resize_batches, schema="doc_id bigint, rs_sum bigint"
    )
    return resized.select(
        "doc_id",
        F.lit(RESIZE_W).cast("int").alias("out_w"),
        F.lit(RESIZE_H).cast("int").alias("out_h"),
        F.round(
            F.col("rs_sum").cast("double") / F.lit(RESIZE_W * RESIZE_H), 6
        ).alias("mean_resized"),
    )


PHASH_W, PHASH_H = 9, 8  # 9x8 sample grid -> 8x8 = 64 gradient bits


@register(
    "multimodal_image_phash",
    # symbolic oracle over the REAL decode + dHash: the Spark side packs
    # gradient bits from pixels sampled off the decoded bytes; the oracle
    # replays the identical grid + comparisons over the synthetic pattern.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id, n, 1 + n % 64 AS w, 1 + (n * 3) % 48 AS h FROM d
    ),
    bits AS (
      SELECT doc_id,
        CAST(u.i AS INT) AS k,
        CASE WHEN ((((u.i % 8) + 1) * w // {PHASH_W}) * 31
                   + ((u.i // 8) * h // {PHASH_H}) * 17 + n) % 256
                > (((u.i % 8) * w // {PHASH_W}) * 31
                   + ((u.i // 8) * h // {PHASH_H}) * 17 + n) % 256
             THEN 1 ELSE 0 END AS b
      FROM dims, UNNEST(range(64)) AS u(i)
    ),
    hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN k >= 32
                           THEN CAST(b AS BIGINT) << (k - 32) ELSE 0 END)
                  AS BIGINT) AS ph_hi,
             CAST(SUM(CASE WHEN k < 32
                           THEN CAST(b AS BIGINT) << k ELSE 0 END)
                  AS BIGINT) AS ph_lo
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id, ph_hi, ph_lo,
           CAST(COUNT(*) OVER (PARTITION BY ph_hi, ph_lo) AS BIGINT)
             AS n_same_hash
    FROM hashes
"""
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hash (dHash) on the REAL pixel path — the
    image-dedup primitive: sample the decoded image to a 9×8 grid
    (same floor-scaled nearest-neighbor indexing as
    `multimodal_image_resize`), emit 64 horizontal-gradient bits, and
    count how many corpus images share each hash. dHash survives
    re-encoding and resizing, which is exactly why training-data
    pipelines dedup images by it rather than by byte hash; near-dups
    at Hamming ≤ t would band the two 32-bit halves into buckets —
    the `dedup_minhash` LSH shape, reusable verbatim.

    Map-only Arrow decode + hash, then ONE hash-keyed window for the
    duplicate count (at 100 TB: a groupBy(hash) join instead, same
    shuffle). The oracle replays the grid, the gradient comparisons,
    and the bit packing symbolically — one flipped bit hash-fails.
    """
    import numpy as np  # noqa: PLC0415

    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    src = d.select("doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n"))

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(PHASH_W)
        ys = np.arange(PHASH_H)
        for pdf in batches:
            ids, his, los = [], [], []
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                if pd.isna(n):  # int column with nulls arrives as NaN
                    # missing media: no gradient evidence, all 64 bits
                    # stay 0 (oracle: NULL comparisons fold to ELSE 0) —
                    # null images collapse into the zero-hash bucket
                    ids.append(int(doc_id))
                    his.append(0)
                    los.append(0)
                    continue
                n = int(n)
                m = decode_image(make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n))
                arr = np.frombuffer(bytes(m["pixels"]), dtype=np.uint8).reshape(
                    m["height"], m["width"]
                )
                grid = arr[np.ix_((ys * m["height"]) // PHASH_H,
                                  (xs * m["width"]) // PHASH_W)].astype(np.int16)
                bits = (grid[:, 1:] > grid[:, :-1]).flatten()  # row-major k=y*8+x
                hi = int(sum(1 << (k - 32) for k in range(32, 64) if bits[k]))
                lo = int(sum(1 << k for k in range(32) if bits[k]))
                ids.append(int(doc_id))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame({"doc_id": ids, "ph_hi": his, "ph_lo": los})

    hashed = src.mapInPandas(
        phash_batches, schema="doc_id bigint, ph_hi bigint, ph_lo bigint"
    )
    w = Window.partitionBy("ph_hi", "ph_lo")
    return hashed.select(
        "doc_id",
        "ph_hi",
        "ph_lo",
        F.count(F.lit(1)).over(w).cast("long").alias("n_same_hash"),
    )


@register(
    "multimodal_decode_errors",
    oracle="""
    SELECT
      doc_id,
      CASE WHEN text IS NULL THEN FALSE
           ELSE doc_id % 4 IN (0, 3) END AS ok,
      CASE WHEN text IS NULL THEN 'missing'
           WHEN doc_id % 4 = 1 THEN 'corrupt'
           WHEN doc_id % 4 = 2 THEN 'unsupported' END AS err_kind,
      CASE WHEN text IS NOT NULL AND doc_id % 4 IN (0, 3)
           THEN CAST(1 + octet_length(encode(text)) % 64 AS INT) END AS width,
      CASE WHEN text IS NOT NULL AND doc_id % 4 IN (0, 3)
           THEN CAST(1 + (octet_length(encode(text)) * 3) % 48 AS INT) END AS height
    FROM documents
    """,
)
def multimodal_decode_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE media decode — the corrupt-input discipline
    (``source_json_corrupt``) applied to the binary lane: at 100 TB a
    media corpus ALWAYS contains truncated and mislabeled payloads, and
    one bad byte string must quarantine a ROW, never kill the job. The
    fixture plants a deterministic mix (doc_id mod 4): valid PNGs,
    PNG-magic payloads truncated mid-IDAT ('corrupt'), and non-image
    bytes ('unsupported'); the executor-side decode wraps
    ``decode_image`` per payload and classifies failures by container
    evidence (PNG magic present ⇒ corrupt, else unsupported) — the
    classification is a deterministic function of the payload, NOT of
    which exception class a particular truncation point raises, so the
    oracle is closed-form SQL over doc_id. Successful rows carry real
    decoded dimensions (the decoder genuinely ran); failed rows carry
    the quarantine columns a re-drive pipeline filters on. Map-only
    Arrow batches, same scale shape as the strict decoder."""
    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    src = d.select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )

    def decode_permissive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "ok": [], "err_kind": [], "width": [], "height": []
        }
        for pdf in batches:
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                if pd.isna(n):  # int column with nulls arrives as NaN
                    # a missing payload is its own quarantine class: not
                    # ok, not a decoder failure — nothing ever arrived
                    out["doc_id"].append(doc_id)
                    out["ok"].append(False)
                    out["err_kind"].append("missing")
                    out["width"].append(None)
                    out["height"].append(None)
                    continue
                n = int(n)
                lane = doc_id % 4
                if lane == 1:
                    png = make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n)
                    payload = png[: max(12, len(png) // 2)]  # mid-stream cut
                elif lane == 2:
                    payload = b"NOTANIMAGE" + bytes([n % 256]) * 16
                else:
                    payload = make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n)
                try:
                    m = decode_image(payload)
                    ok, kind, w, h = True, None, m["width"], m["height"]
                except Exception:
                    ok, w, h = False, None, None
                    kind = (
                        "corrupt"
                        if payload[:8] == _PNG_MAGIC
                        else "unsupported"
                    )
                out["doc_id"].append(doc_id)
                out["ok"].append(ok)
                out["err_kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
        yield pd.DataFrame(out)

    return src.mapInPandas(
        decode_permissive,
        schema="doc_id bigint, ok boolean, err_kind string, width int, height int",
    )


@register(
    "multimodal_image_histogram",
    # The oracle recomputes the full per-bucket pixel distribution
    # symbolically; the Spark side counts REAL decoded bytes, so any
    # decoder defect that preserves the sum but moves a pixel value
    # (a wrong unfilter branch, a palette swap) hash-fails here even
    # though multimodal_image_decode's mean would pass.
    oracle="""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id, n, 1 + n % 64 AS w, 1 + (n * 3) % 48 AS h FROM d
    )
    SELECT doc_id,
           CAST(((u.i % w) * 31 + (u.i // w) * 17 + n) % 256 // 32
                AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM dims, UNNEST(range(w * h)) AS u(i)
    GROUP BY 1, 2
    """,
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 8-bucket intensity histogram over REAL decoded pixels
    — the feature-extraction stage after `multimodal_image_decode`'s
    smoke statistic: synthesize the deterministic PNG per document,
    fully decode it (zlib inflate + scanline unfiltering, PIL fast
    path), and count pixels per 32-value bucket. A histogram is the
    canonical cheap image feature (dedup pre-filter, exposure/quality
    screen) AND a strictly stronger decode check than the mean: a
    decoder defect that conserves the pixel SUM but moves values
    (wrong unfilter branch, palette swap) fails this oracle.

    Exactness: bucket = pixel DIV 32 over exact decoded byte values;
    the oracle recomputes the synthesized pattern symbolically, so
    every count is an independent integer check of every pixel. Empty
    buckets are absent on both sides (GROUP BY emits only observed
    buckets).

    Physics: map-only Arrow batches (the `multimodal_image_decode`
    plumbing) emitting <= 8 rows per image, then one map-side-combined
    rollup — at 100 TB the shuffle carries 8 tiny rows per image, and
    the decode cost dominates exactly as it should. NULL text → no
    payload → no rows (oracle's range(NULL) agrees).
    """
    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    src = d.select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )

    def decode_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter  # noqa: PLC0415

        for pdf in batches:
            out_doc, out_bucket, out_npx = [], [], []
            for did, n in zip(pdf["doc_id"], pdf["n"]):
                if pd.isna(n):
                    continue
                n = int(n)
                meta = decode_image(
                    make_png(1 + n % 64, 1 + (n * 3) % 48, seed=n)
                )
                for bucket, cnt in sorted(
                    Counter(px >> 5 for px in meta["pixels"]).items()
                ):
                    out_doc.append(did)
                    out_bucket.append(bucket)
                    out_npx.append(cnt)
            yield pd.DataFrame(
                {"doc_id": out_doc, "bucket": out_bucket, "n_px": out_npx}
            )

    # No re-aggregation: a document is ONE input row, so its buckets
    # are complete within the batch that decoded it — the stage stays
    # map-only end to end (plan-gated).
    return src.mapInPandas(
        decode_hist, schema="doc_id bigint, bucket int, n_px bigint"
    )
