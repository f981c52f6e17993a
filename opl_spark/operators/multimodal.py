"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed through Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing — schemas, batch iteration, partitioning — is
real and tested.  Decoding has three codecs: ``codec="real"`` decodes
actual images through Pillow when it is installed (optional import —
in environments without Pillow it raises ``NotImplementedError``
loudly rather than faking success); ``codec="bmp"`` is a dependency-
free pure-numpy decoder for uncompressed 24/32-bit BMP payloads (a
REAL bytes→pixels decode — header dims, BGR(A) unpadding, row-order —
so the real-decode pipeline is exercised in CI even where Pillow is
absent); and the default deterministic ``"fake"`` codec derives
metadata purely from the bytes so the distributed path stays
exercised on arbitrary payloads.  All three run the IDENTICAL
mapInPandas plan; only the per-record decode function differs.
Audio/video (ffmpeg) remain stub-only.

Scale notes: media bytes never pass through the driver; each Arrow
batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, so
executor memory bounds are explicit.  Decoded/derived columns travel
with the row — downstream operators (dedup on perceptual hash,
similarity on image embeddings) reuse the text/vector machinery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media column schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("media_id", T.LongType()),
    ]
)

#: Output schema of the (stubbed) image decode stage.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def with_media_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test-fixture ingestion: pack a text column into the canonical
    binary media layout (stand-in for reading real blobs; the driver
    environment ships no media files).

    Widened BY BYTES (r14): every downstream mapInPandas decode of a
    few-split input otherwise runs on one Python worker, but THIS
    tier's decodes are cheap enough that a full 32-way fan-out costs
    more than it buys on a sub-MB input (alternated two-scale pairing:
    sf0.1 audio 0.59 narrow vs 0.66 wide / phash 0.61 vs 0.91, while
    sf1 reads 2.54 → 0.81 and 1.77 → 1.03).  1 MiB/slice arbitrates:
    identity on the sub-MB sf0.1 input, ~5-way on sf1, and at real
    scale the scan is wider than the cluster anyway (identity).  The
    heavier BMP tier measured full-width fastest at BOTH scales and
    keeps the plain widen — see synthetic_bmp_media."""
    from opl_spark.operators.dedup import widen_narrow_scan

    df = widen_narrow_scan(df, bytes_per_slice=1 << 20)
    return df.select(
        F.struct(
            F.encode(F.col(text_col), "UTF-8").alias("media_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.col(id_col).cast("long").alias("media_id"),
        ).alias("media")
    )


def media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata pass — byte length + content hash — as built-in
    expressions (no Python): the dedup/bookkeeping columns every media
    pipeline wants before any decode."""
    m = F.col(media_col)
    return df.select(
        m["media_id"].alias("media_id"),
        m["mime"].alias("mime"),
        F.length(m["media_bytes"]).cast("long").alias("byte_len"),
        F.md5(m["media_bytes"]).alias("content_md5"),
    )


def _bmp_tools():
    """Pure-numpy BMP codec, packaged as closure-local functions.

    Returned as locals (not module-level defs) so that capturing them
    inside a ``mapInPandas`` batch closure makes cloudpickle ship them
    BY VALUE to executor Python workers — same self-containment rule
    as the decode closures below (workers may not have this module
    importable).  Returns ``(decode, encode, area_resize)``:

    - ``decode(by) -> (width, height, rgba uint8 [h,w,4])`` for
      uncompressed (BI_RGB) 24/32-bit BMPs, bottom-up or top-down;
    - ``encode(arr) -> bytes`` writes a 24-bit bottom-up BMP from an
      RGB(A) uint8 array (alpha dropped — BMP24 has none);
    - ``area_resize(img, oh, ow)`` deterministic box-filter resize
      (nearest-neighbor duplication first when upscaling) — the
      library-free stand-in for Pillow's thumbnail filter.
    """
    import struct

    import numpy as np

    def decode(by: bytes):
        if by[:2] != b"BM":
            raise ValueError("not a BMP payload (missing 'BM' magic)")
        data_off = struct.unpack_from("<I", by, 10)[0]
        hdr_size = struct.unpack_from("<I", by, 14)[0]
        if hdr_size < 40:
            raise ValueError("unsupported BMP core header")
        w = struct.unpack_from("<i", by, 18)[0]
        h = struct.unpack_from("<i", by, 22)[0]
        bpp = struct.unpack_from("<H", by, 28)[0]
        comp = struct.unpack_from("<I", by, 30)[0]
        if comp not in (0, 3) or bpp not in (24, 32):
            raise ValueError(
                f"unsupported BMP variant bpp={bpp} compression={comp}"
            )
        if comp == 3:
            # BI_BITFIELDS: the channel masks live at absolute offset
            # 54 whether the DIB is BITMAPINFOHEADER (masks follow the
            # 40-byte header) or V4/V5 (masks at DIB offset 40).  The
            # decode below assumes little-endian BGR(A) memory layout,
            # i.e. R=0xFF0000 G=0xFF00 B=0xFF (A=0xFF000000 or absent);
            # any other mask set would silently swap channels, so the
            # fail-loud policy rejects it instead of decoding wrong.
            rm, gm, bm = struct.unpack_from("<III", by, 54)
            am = (
                struct.unpack_from("<I", by, 66)[0]
                if hdr_size >= 56 and data_off >= 70
                else 0
            )
            if (rm, gm, bm) != (0xFF0000, 0xFF00, 0xFF) or am not in (
                0,
                0xFF000000,
            ):
                raise ValueError(
                    "BI_BITFIELDS masks "
                    f"r={rm:#x} g={gm:#x} b={bm:#x} a={am:#x} "
                    "do not match the BGRA layout this codec assumes"
                )
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0:
            raise ValueError("degenerate BMP dimensions")
        nch = bpp // 8
        stride = ((w * nch) + 3) & ~3
        px = np.frombuffer(by, dtype=np.uint8, count=stride * h, offset=data_off)
        px = px.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[..., 0] = px[..., 2]
        rgba[..., 1] = px[..., 1]
        rgba[..., 2] = px[..., 0]
        rgba[..., 3] = px[..., 3] if nch == 4 else 255
        return w, h, rgba

    def encode(arr) -> bytes:
        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim != 3 or a.shape[2] not in (3, 4):
            raise ValueError("expected [h,w,3|4] uint8 array")
        h, w = a.shape[:2]
        bgr = a[..., (2, 1, 0)]
        stride = ((w * 3) + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr[::-1].reshape(h, w * 3)
        size = 14 + 40 + rows.size
        hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rows.size, 2835, 2835, 0, 0
        )
        return hdr + dib + rows.tobytes()

    def area_resize(img, oh: int, ow: int):
        a = np.asarray(img, dtype=np.float64)
        h, w = a.shape[:2]
        if h < oh:  # nearest-duplicate up so every output bin is fed
            a = a[(np.arange(oh) * h) // oh]
            h = oh
        if w < ow:
            a = a[:, (np.arange(ow) * w) // ow]
            w = ow
        ri = (np.arange(h) * oh) // h
        ci = (np.arange(w) * ow) // w
        out = np.zeros((oh, ow) + a.shape[2:], dtype=np.float64)
        cnt = np.zeros((oh, ow), dtype=np.float64)
        np.add.at(out, (ri[:, None], ci[None, :]), a)
        np.add.at(cnt, (ri[:, None], ci[None, :]), 1.0)
        return out / (cnt[..., None] if out.ndim == 3 else cnt)

    return decode, encode, area_resize


#: Driver-side aliases (tests, fixtures).  Executor closures call
#: ``_bmp_tools()`` themselves — see the NOTE in ``decode_images``.
bmp_decode, bmp_encode, bmp_area_resize = _bmp_tools()


def _fake_decode(media_bytes: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: dimensions and a feature vector
    derived from the raw bytes (NOT a real codec — see module doc)."""
    n = len(media_bytes)
    width = (n % 64) + 1
    height = (n % 48) + 1
    # 8-dim "feature": byte-sum folded per stride bucket, normalized
    feat = [0.0] * 8
    for i, by in enumerate(media_bytes):
        feat[i % 8] += by
    total = sum(feat) or 1.0
    return width, height, [round(f / total, 6) for f in feat]


def export_tar_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    columns: list[str],
    shards: int | None = None,
) -> dict:
    """WebDataset-style tar-shard export — the interchange layout
    multimodal training loaders stream (Aizman et al. 2019;
    github.com/webdataset): each output ``shard-NNNNN.tar`` holds one
    ``{key}.{column}`` member per (row, payload column), samples
    contiguous within a shard so a loader reads them with pure
    sequential I/O.  Binary columns write as-is; anything else writes
    as UTF-8.  Member mtimes are zeroed, so identical data produces
    byte-identical shards regardless of when the export ran.

    Executor-parallel: one tar per partition, STREAMED member-by-member
    straight to the output file inside a ``mapInPandas`` pass (Spark
    has no tar sink; the Python tarfile module inside the batch
    iterator is the idiomatic escape hatch for a FORMAT Spark lacks,
    while partitioning/distribution stay Spark's).  Per-task memory is
    O(one Arrow batch), NOT O(partition bytes) — the tar is never
    buffered whole, so partition size is bounded by disk, not worker
    RAM.  ``shards`` controls file count via repartition, as in
    ``export_jsonl``.  The driver collects only the shard MANIFEST
    (one row per shard: file, rows, bytes) and returns it as
    ``{"total_rows": n, "shards": [...]}`` — never sample data.  The
    target must be a path every executor can write (shared mount;
    swap the ``open`` for an object-store client off-cluster).

    Refuses a directory that already holds ``shard-*.tar`` files: a
    re-export with fewer/different shards would leave stale tars that a
    loader globbing ``shard-*.tar`` silently mixes into the corpus."""
    import glob as _glob
    import os as _os

    _os.makedirs(path, exist_ok=True)
    stale = sorted(_glob.glob(_os.path.join(path, "shard-*.tar")))
    if stale:
        raise ValueError(
            f"export_tar_shards: {path!r} already contains "
            f"{len(stale)} shard-*.tar file(s) (first: {stale[0]!r}); "
            "remove them or export to a fresh directory — a loader "
            "globbing shard-*.tar would read a mixed corpus"
        )
    # sweep temp litter from a previously CRASHED export (complete
    # shards from it would have been promoted to shard-*.tar and
    # tripped the refusal above; leftover dot-temps are by definition
    # incomplete and safe to drop)
    for leftover in _glob.glob(_os.path.join(path, ".shard-*.tar.*")):
        _os.remove(leftover)
    out = df.repartition(shards) if shards else df
    sel = out.select(F.col(id_col).alias("__key"), *columns)
    payload_cols = list(columns)

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import os
        import tarfile

        import pandas as _pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"shard-{pid:05d}.tar")
        # write-to-temp + atomic rename: streaming straight to the
        # final name left a window where (a) two speculative attempts
        # of the same task interleave writes into one file and (b) a
        # mid-job crash leaves a partial tar indistinguishable from a
        # complete one (which the stale-shard refusal would then
        # misreport as a prior successful export).  The dot-prefixed
        # attempt-unique temp name is invisible to loaders and to the
        # refusal glob (both match shard-*.tar); os.replace promotes
        # it atomically after close, so the final name only ever holds
        # a complete tar — last finished attempt wins, same as any
        # Spark file sink.
        tmpname = os.path.join(
            path, f".shard-{pid:05d}.tar.{ctx.taskAttemptId()}"
        )
        rows = 0
        tar = None  # opened lazily: empty partitions write no file
        try:
            for pdf in it:
                for i in range(len(pdf)):
                    if tar is None:
                        tar = tarfile.open(tmpname, mode="w")
                    key = str(pdf["__key"].iloc[i])
                    for c in payload_cols:
                        v = pdf[c].iloc[i]
                        data = (
                            bytes(v)
                            if isinstance(v, (bytes, bytearray, memoryview))
                            else str(v).encode("utf-8")
                        )
                        info = tarfile.TarInfo(f"{key}.{c}")
                        info.size = len(data)
                        info.mtime = 0
                        tar.addfile(info, io.BytesIO(data))
                    rows += 1
        except BaseException:
            if tar is not None:
                tar.close()
                os.remove(tmpname)  # never leave temp litter on error
            raise
        if tar is not None:
            tar.close()
            os.replace(tmpname, fname)
        if not rows:
            yield _pd.DataFrame({"shard": [], "rows": [], "bytes": []})
            return
        yield _pd.DataFrame(
            [{"shard": fname, "rows": rows, "bytes": os.path.getsize(fname)}]
        )

    manifest_rows = sel.mapInPandas(
        write_part, "shard string, rows long, bytes long"
    ).collect()
    shards_out = sorted(
        ({"shard": r["shard"], "rows": r["rows"], "bytes": r["bytes"]}
         for r in manifest_rows),
        key=lambda s: s["shard"],
    )
    return {
        "total_rows": int(sum(s["rows"] for s in shards_out)),
        "shards": shards_out,
    }


def synthetic_bmp_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic synthetic BMP corpus: one REAL 24-bit BMP payload
    per row in the canonical media layout — solid color keyed off the
    id, dimensions keyed off the text byte length with the same
    ``(n % 64) + 1`` / ``(n % 48) + 1`` rule as the stub codec (so
    oracles share the formula).  This is the bench/test feed for the
    dependency-free real-decode path: the payloads are real BMP
    containers, so ``decode_images(codec='bmp')`` does full header
    parsing + pixel-array statistics, not stub passthrough.

    Scale shape: map-only — one Arrow-batched pandas UDF pass, no
    shuffle; payload size is bounded by the dim rule (≤ 64×48×3 B
    plus headers), so batch memory stays O(batch × 9 KiB).

    Widened (r14, reversing the r13 sf0.1-only revert with two-scale
    evidence): the encode AND every downstream mapInPandas decode are
    Python compute on a zero-shuffle plan, so a few-split input runs
    the whole tier on ONE Python worker.  Properly ALTERNATED 3-way
    pairing this round (none / bytes-proportional / full width, one
    session, both scales): full width is fastest at BOTH scales —
    sf0.1 2.00 → 1.74 s, sf1 9.74 → 1.89 s (5×) — i.e. the r13
    "+32-worker hand-off" revert does not reproduce; the hand-off
    cost is noise-level against even the sf0.1 tier's decode work.
    Identity at scale (widen_narrow_scan contract)."""
    from opl_spark.operators.dedup import widen_narrow_scan

    df = widen_narrow_scan(df)
    encode = _bmp_tools()[1]

    def make(ids: pd.Series, ns: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        out = []
        for i, n in zip(ids, ns):
            w, h = int(n % 64) + 1, int(n % 48) + 1
            rgb = _np.empty((h, w, 3), _np.uint8)
            rgb[..., 0] = i % 256
            rgb[..., 1] = (i * 7) % 256
            rgb[..., 2] = (i * 13) % 256
            out.append(encode(rgb))
        return _pd.Series(out)

    make_udf = F.pandas_udf(make, T.BinaryType())
    ident = F.col(id_col).cast("long")
    return df.select(
        F.struct(
            make_udf(ident, F.octet_length(F.col(text_col)).cast("long")).alias(
                "media_bytes"
            ),
            F.lit("image/bmp").alias("mime"),
            ident.alias("media_id"),
        ).alias("media")
    )


def decode_images(
    df: DataFrame, media_col: str = "media", codec: str = "fake"
) -> DataFrame:
    """Decode / feature-extract stage over Arrow batches.

    ``codec="real"`` decodes through Pillow (optional import; raises
    ``NotImplementedError`` where Pillow is absent — never a silent
    fake).  ``codec="bmp"`` is the dependency-free real decode for
    uncompressed BMP payloads (pure numpy — see ``_bmp_tools``).
    ``codec="fake"`` exercises the identical mapInPandas plumbing
    with the deterministic stub.
    """
    if codec == "real":
        try:
            import PIL.Image  # noqa: F401 — driver-side availability gate
        except ImportError as exc:
            raise NotImplementedError(
                "codec='real' requires Pillow, which is not installed in "
                "this environment; use codec='fake' for the plumbing path "
                "or codec='bmp' for the dependency-free real decode"
            ) from exc
        return _decode_images_real(df, media_col)
    if codec == "bmp":
        return _decode_images_bmp(df, media_col)
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    # NOTE: the batch closure must be fully self-contained (no module
    # globals): cloudpickle serializes references to this module by
    # name, and executor Python workers may not have it importable.
    cols = [f.name for f in DECODED_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_decode(media_bytes: bytes):
            n = len(media_bytes)
            width = (n % 64) + 1
            height = (n % 48) + 1
            feat = [0.0] * 8
            for i, by in enumerate(media_bytes):
                feat[i % 8] += by
            total = sum(feat) or 1.0
            return width, height, [round(f / total, 6) for f in feat]

        for pdf in it:
            media = pdf[media_col]
            rows = []
            for rec in media:
                by = bytes(rec["media_bytes"])
                w, h, feat = fake_decode(by)
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "mime": rec["mime"],
                        "byte_len": len(by),
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield _pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def _decode_images_real(df: DataFrame, media_col: str) -> DataFrame:
    """Pillow decode over the same mapInPandas plan as the stub codec:
    real (width, height) from the image header and an 8-dim feature —
    per-channel mean + std of a 16×16 RGBA thumbnail (a deterministic,
    library-stable stand-in for a learned embedding).  Executors import
    Pillow inside the batch closure, so the cluster needs it installed
    wherever tasks run — exactly like any Python dependency of a
    Pandas UDF."""
    cols = [f.name for f in DECODED_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as _np
        import pandas as _pd
        from PIL import Image

        for pdf in it:
            rows = []
            for rec in pdf[media_col]:
                by = bytes(rec["media_bytes"])
                img = Image.open(io.BytesIO(by))
                width, height = img.size
                thumb = img.convert("RGBA").resize((16, 16))
                a = _np.asarray(thumb, dtype=_np.float64) / 255.0
                feat = [
                    round(float(x), 6)
                    for x in (*a.mean(axis=(0, 1)), *a.std(axis=(0, 1)))
                ]
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "mime": rec["mime"],
                        "byte_len": len(by),
                        "width": width,
                        "height": height,
                        "feature": feat,
                    }
                )
            yield _pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def _decode_images_bmp(df: DataFrame, media_col: str) -> DataFrame:
    """Dependency-free real decode over the same mapInPandas plan:
    true (width, height) from the BMP header and the same 8-dim
    channel-statistics feature as the Pillow codec — per-channel mean
    + std of RGBA/255, computed over the FULL pixel array (exact,
    where the Pillow path approximates via a 16×16 thumbnail)."""
    cols = [f.name for f in DECODED_SCHEMA.fields]
    decode, _encode, _resize = _bmp_tools()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for rec in pdf[media_col]:
                by = bytes(rec["media_bytes"])
                width, height, rgba = decode(by)
                a = rgba.astype(_np.float64) / 255.0
                feat = [
                    round(float(x), 6)
                    for x in (*a.mean(axis=(0, 1)), *a.std(axis=(0, 1)))
                ]
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "mime": rec["mime"],
                        "byte_len": len(by),
                        "width": width,
                        "height": height,
                        "feature": feat,
                    }
                )
            yield _pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_images(
    df: DataFrame, media_col: str = "media", max_dim: int = 32,
    codec: str = "fake",
) -> DataFrame:
    """Resize stage.  ``codec="fake"`` (default) recomputes target
    dimensions with aspect preserved and re-emits the payload
    unchanged (shape-only stand-in).  ``codec="bmp"`` is a TRUE
    transcode for BMP payloads: decode → box-filter downscale with
    aspect preserved (no-op when already within ``max_dim``) →
    re-encode as 24-bit BMP.  Either way the Spark shape is the real
    one — map-only mapInPandas, media bytes never touching the
    driver."""
    if codec == "bmp":
        return _resize_images_bmp(df, media_col, max_dim)
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("media_bytes", T.BinaryType()),
        ]
    )
    cap = int(max_dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # self-contained closure (see decode_images)

        for pdf in it:
            rows = []
            for rec in pdf[media_col]:
                by = bytes(rec["media_bytes"])
                n = len(by)
                w, h = (n % 64) + 1, (n % 48) + 1  # fake-decode dims
                scale = min(1.0, cap / max(w, h))
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "width": max(1, int(w * scale)),
                        "height": max(1, int(h * scale)),
                        "media_bytes": by,
                    }
                )
            yield _pd.DataFrame(
                rows, columns=["media_id", "width", "height", "media_bytes"]
            )

    return df.mapInPandas(batches, schema=schema)


def _resize_images_bmp(
    df: DataFrame, media_col: str, max_dim: int
) -> DataFrame:
    """True BMP transcode twin of the fake resize: same output schema,
    but ``media_bytes`` really are the resized image re-encoded."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("media_bytes", T.BinaryType()),
        ]
    )
    cap = int(max_dim)
    decode, encode, area_resize = _bmp_tools()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for rec in pdf[media_col]:
                by = bytes(rec["media_bytes"])
                w, h, rgba = decode(by)
                scale = min(1.0, cap / max(w, h))
                ow = max(1, int(w * scale))
                oh = max(1, int(h * scale))
                if (ow, oh) != (w, h):
                    resized = area_resize(rgba[..., :3], oh, ow)
                    by = encode(
                        _np.clip(_np.rint(resized), 0, 255).astype(_np.uint8)
                    )
                else:
                    ow, oh = w, h
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "width": ow,
                        "height": oh,
                        "media_bytes": by,
                    }
                )
            yield _pd.DataFrame(
                rows, columns=["media_id", "width", "height", "media_bytes"]
            )

    return df.mapInPandas(batches, schema=schema)


def frame_sample(
    df: DataFrame, media_col: str = "media", every_n_bytes: int = 1024
) -> DataFrame:
    """Video-frame-sampling stand-in: emits one row per sampled offset
    (the real implementation samples decoded frames; the shape —
    one-to-many mapInPandas with bounded batches — is identical)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # self-contained closure (see decode_images)

        for pdf in it:
            rows = []
            for rec in pdf[media_col]:
                n = len(bytes(rec["media_bytes"]))
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows.append(
                        {"media_id": rec["media_id"], "frame_no": i, "offset": off}
                    )
            yield _pd.DataFrame(rows, columns=["media_id", "frame_no", "offset"])

    return df.mapInPandas(batches, schema=schema)


def audio_frame_energy(
    df: DataFrame,
    media_col: str = "media",
    frame_bytes: int = 256,
    hop_bytes: int = 128,
) -> DataFrame:
    """Audio feature extraction shape: framed short-time energy over
    the payload — one output row per (media, frame) with the frame's
    mean-square "energy" and a silence flag.  The codec is the
    deterministic byte-level stand-in (samples = raw bytes centered at
    128; a real pipeline decodes PCM first — same integration point as
    ``decode_images(codec="real")``), but the Spark shape is the real
    one: framing fan-out happens INSIDE the Arrow batch (numpy
    stride tricks, no per-frame Python), output rows are
    frame-granular, and downstream silence trimming / VAD filters are
    plain DataFrame predicates.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        "media_id long, frame int, energy double, is_silence boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, energies = [], [], []
            for mid, payload in zip(
                pdf[media_col].apply(lambda m: m["media_id"]),
                pdf[media_col].apply(lambda m: m["media_bytes"]),
            ):
                x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                if len(x) < frame_bytes:
                    x = np.pad(x, (0, frame_bytes - len(x)))
                n_frames = 1 + (len(x) - frame_bytes) // hop_bytes
                idx = (
                    np.arange(frame_bytes)[None, :]
                    + hop_bytes * np.arange(n_frames)[:, None]
                )
                e = np.square(x[idx]).mean(axis=1).round(6)
                ids.extend([mid] * n_frames)
                frames.extend(range(n_frames))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame": pd.Series(frames, dtype="int32"),
                    "energy": pd.Series(energies, dtype="float64"),
                    "is_silence": pd.Series(
                        [e < 1.0 for e in energies], dtype="bool"
                    ),
                }
            )

    return df.mapInPandas(batches, out_schema)


def image_phash(
    df: DataFrame, media_col: str = "media", codec: str = "fake", bits: int = 63
) -> DataFrame:
    """Perceptual hash per image: 63-bit average-hash (aHash) — a grid
    of brightness cells thresholded at the grid mean, packed into a
    signed BIGINT (63 bits so the value stays positive, mirroring
    ``operators.dedup.simhash``).

    ``codec="fake"`` derives the 64-cell grid deterministically from
    the payload bytes (position-mod-64 byte fold — the stand-in
    "image"); ``codec="real"`` builds it from an 8×8 grayscale Pillow
    thumbnail; ``codec="bmp"`` builds it dependency-free from a real
    BMP decode — BT.601 luma, box-filtered to 8×8 (scale-invariant:
    an area-downscaled copy of an image box-filters to the same 8×8
    grid, so its aHash matches — pinned by test).  Identical
    mapInPandas plan all three ways; identical downstream
    banding/hamming machinery as text SimHash — near-dup *image*
    dedup reuses the text dedup scale path unchanged.
    """
    if codec == "real":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "codec='real' requires Pillow; use codec='fake' for the "
                "plumbing path or codec='bmp' for the dependency-free "
                "real decode"
            ) from exc

    out_schema = "media_id long, phash long"
    use_real = codec == "real"
    use_bmp = codec == "bmp"
    if codec not in ("fake", "real", "bmp"):
        raise ValueError(f"unknown codec {codec!r}")
    n_bits = int(bits)
    bmp_decode_fn, _enc, bmp_resize_fn = _bmp_tools() if use_bmp else (
        None, None, None,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def grid_of(by: bytes) -> "_np.ndarray":
            if use_real:
                import io

                from PIL import Image

                img = Image.open(io.BytesIO(by)).convert("L").resize((8, 8))
                return _np.asarray(img, dtype=_np.float64).reshape(64)
            if use_bmp:
                _w, _h, rgba = bmp_decode_fn(by)
                luma = (
                    0.299 * rgba[..., 0]
                    + 0.587 * rgba[..., 1]
                    + 0.114 * rgba[..., 2]
                )
                return bmp_resize_fn(luma, 8, 8).reshape(64)
            x = _np.frombuffer(by, dtype=_np.uint8).astype(_np.float64)
            if len(x) == 0:
                return _np.zeros(64)
            return _np.bincount(
                _np.arange(len(x)) % 64, weights=x, minlength=64
            )

        for pdf in it:
            ids, hashes = [], []
            for rec in pdf[media_col]:
                g = grid_of(bytes(rec["media_bytes"]))
                above = g > g.mean()
                h = 0
                for b in range(n_bits):
                    if above[b]:
                        h |= 1 << b
                ids.append(rec["media_id"])
                hashes.append(h)
            yield _pd.DataFrame(
                {
                    "media_id": _pd.Series(ids, dtype="int64"),
                    "phash": _pd.Series(hashes, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, out_schema)


def phash_dup_candidates(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup image pairs from perceptual hashes: the SimHash
    chunk-equality banding (pigeonhole on 16-bit chunks) bounds the
    candidate join, then exact hamming filters.  Exact byte-duplicates
    always hash identically (hamming 0), so recall on true copies is 1
    regardless of the banding."""
    from opl_spark.operators.dedup import simhash_candidates

    sim = hashes.select(
        F.col("media_id").alias("doc"), F.col("phash").alias("simhash")
    )
    return (
        simhash_candidates(sim)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").alias("media_a"),
            F.col("id_b").alias("media_b"),
            "hamming",
        )
    )


def video_scene_changes(
    df: DataFrame,
    media_col: str = "media",
    frame_bytes: int = 256,
    threshold: float = 8.0,
) -> DataFrame:
    """Shot-boundary detection shape: per-frame brightness means over
    fixed-size payload windows (the stand-in for decoded frame luma —
    same integration point as ``decode_images(codec="real")``), then a
    lag-window difference cut at ``threshold`` and an island cumsum to
    number shots.  Returns one row per (media, shot): start frame and
    frame count.

    The Python stage is map-only framing inside Arrow batches; shot
    assembly is pure JVM window work partitioned by ``media_id`` —
    per-media frame counts are payload/frame_bytes, so no partition
    outgrows a single video's frame list.
    """
    from pyspark.sql import Window

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            ids, frames, lumas = [], [], []
            for rec in pdf[media_col]:
                x = _np.frombuffer(
                    bytes(rec["media_bytes"]), dtype=_np.uint8
                ).astype(_np.float64)
                if len(x) == 0:
                    continue
                pad = (-len(x)) % frame_bytes
                if pad:
                    x = _np.pad(x, (0, pad))
                fr = x.reshape(-1, frame_bytes).mean(axis=1).round(6)
                ids.extend([rec["media_id"]] * len(fr))
                frames.extend(range(len(fr)))
                lumas.extend(fr.tolist())
            yield _pd.DataFrame(
                {
                    "media_id": _pd.Series(ids, dtype="int64"),
                    "frame": _pd.Series(frames, dtype="int32"),
                    "luma": _pd.Series(lumas, dtype="float64"),
                }
            )

    frames_df = df.mapInPandas(batches, "media_id long, frame int, luma double")
    w = Window.partitionBy("media_id").orderBy("frame")
    flagged = frames_df.withColumn(
        "is_cut",
        F.when(
            F.abs(F.col("luma") - F.lag("luma").over(w)) > threshold, 1
        ).otherwise(0),
    ).withColumn(
        "shot_no",
        F.sum("is_cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("media_id", "shot_no")
        .agg(
            F.min("frame").alias("start_frame"),
            F.count(F.lit(1)).alias("n_frames"),
        )
    )


def vad_segments(
    frames: DataFrame, threshold: float = 1.0, id_col: str = "media_id"
) -> DataFrame:
    """Voice-activity segments from framed energies: consecutive
    frames at-or-above ``threshold`` merge into one segment per run
    (gaps-and-islands: ``frame − row_number`` is constant within a
    run) — the silence-trimming step an audio training pipeline runs
    between feature extraction and chunking.  Input is
    :func:`audio_frame_energy` output (or any ``(id, frame, energy)``
    frame table, batch or foreachBatch micro-batch).

    Exactness: energies arrive round-6 quantized, so re-quantizing to
    micro-units makes per-segment sums exact BIGINTs; the mean is one
    fixed-sequence division.  The only window is per-MEDIA (partitioned
    ranking, island arithmetic is map-side).  Emits
    ``(media_id, seg_start, seg_end, n_frames, mean_energy)``.
    """
    from pyspark.sql.window import Window

    act = frames.filter(F.col("energy") >= threshold).select(
        F.col(id_col),
        F.col("frame"),
        F.floor(F.col("energy") * 1000000 + F.lit(0.5)).cast("long").alias("e6"),
    )
    w = Window.partitionBy(id_col).orderBy("frame")
    isl = act.withColumn("g", F.col("frame") - F.row_number().over(w))
    segs = isl.groupBy(id_col, "g").agg(
        F.min("frame").cast("int").alias("seg_start"),
        F.max("frame").cast("int").alias("seg_end"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("e6").alias("se6"),
    )
    # mean at 6 decimals via integer HALF-UP division — a float
    # `round(sum/n, 6)` sits exactly on the .5 boundary whenever n∤sum
    # by a half and the two engines' round() disagree there (observed:
    # 2092.9042965 → …297 vs …296); (2s+n)//(2n) on positive BIGINTs
    # is boundary-free and identical everywhere
    return segs.select(
        id_col,
        "seg_start",
        "seg_end",
        F.col("n_frames").cast("long").alias("n_frames"),
        (
            F.expr("(2 * se6 + n_frames) DIV (2 * n_frames)").cast("double")
            / F.lit(1000000.0)
        ).alias("mean_energy"),
    )
