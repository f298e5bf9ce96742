"""Real multimodal decode end-to-end (oracle-gated).

The `documents` table drives a deterministic synthetic media corpus —
every doc gets a REAL file payload (doc_id % 3: WAV / PNG / BMP) built
by the pure-stdlib encoders in codecs.py — and `media_features`
DECODES those bytes back (magic-byte sniffing + real PNG/BMP/WAV
parsing) inside Arrow-batched mapInPandas, emitting integer features.

The DuckDB oracle never sees the bytes: it predicts the features from
the closed-form generator formulas. Spark must therefore round-trip
encoder -> real decoder byte-exactly for the gate to pass — this is a
decode correctness check, not a plumbing check.

Generator formulas (mirrored in SQL):
  PNG  (doc_id%3==1): w=4+id%13, h=3+id%11,
       r=(id+x+2y)%256, g=(2id+3x+y)%256, b=(3id+5x+7y)%256
  BMP  (doc_id%3==2): w=2+id%5,  h=2+id%4,  same channel formulas
  WAV  (doc_id%3==0): n=400+id%100 frames @8000 Hz mono,
       s_i = ((31*id+17*i) % 4096) - 2048
Features: pixel_sum = sum over the decoded pixel buffer (= sum r+g+b),
sample_abs_sum = sum |s_i| — integers, so no float drift cross-engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .codecs import (
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav_np,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
    sniff_kind,
)
from .adpcm import STEP_TABLE as ADPCM_STEP_TABLE
from .adpcm import decode_wav_ima, encode_wav_ima
from .mulaw import decode_wav_mulaw, encode_wav_mulaw
from .jpeg import decode_jpeg, encode_jpeg

MEDIA_FEATURE_SCHEMA = (
    "doc_id BIGINT, kind STRING, width INT, height INT, pixel_sum BIGINT, "
    "n_frames INT, sample_rate INT, sample_abs_sum BIGINT"
)


def _rgb(doc_id: int, w: int, h: int) -> bytes:
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            (doc_id + x + 2 * y) % 256,
            (2 * doc_id + 3 * x + y) % 256,
            (3 * doc_id + 5 * x + 7 * y) % 256,
        ],
        axis=-1,
    )
    return px.astype(np.uint8).tobytes()


def synth_payload(doc_id: int) -> bytes:
    m = doc_id % 3
    if m == 0:
        n = 400 + doc_id % 100
        i = np.arange(n, dtype=np.int64)
        samples = ((31 * doc_id + 17 * i) % 4096) - 2048
        return encode_wav(samples)
    if m == 1:
        w, h = 4 + doc_id % 13, 3 + doc_id % 11
        return encode_png(w, h, _rgb(doc_id, w, h))
    w, h = 2 + doc_id % 5, 2 + doc_id % 4
    return encode_bmp(w, h, _rgb(doc_id, w, h))


def media_documents(
    spark: SparkSession, sf_dir: str, only_images: bool = False
) -> DataFrame:
    """(doc_id, payload) — real PNG/BMP/WAV bytes per document.

    ``only_images`` prunes the audio rows at the SCAN (doc_id % 3 != 0)
    rather than after the synth/decode UDF — a filter placed after
    mapInPandas cannot be pushed through the opaque Python stage, so
    image-only consumers (resize) must prune here."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    if only_images:
        d = d.filter(F.col("doc_id") % 3 != 0)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(lambda i: synth_payload(int(i))),
                }
            )

    return d.mapInPandas(synth, "doc_id BIGINT, payload BINARY")


def _features_of(payload: bytes) -> dict:
    kind = sniff_kind(payload)
    if kind == "audio/wav":
        _ch, rate, n, samples = decode_wav_np(payload)
        return {
            "kind": kind, "width": None, "height": None, "pixel_sum": None,
            "n_frames": n, "sample_rate": rate,
            "sample_abs_sum": int(np.abs(samples.astype(np.int64)).sum()),
        }
    if kind == "image/png":
        w, h, _c, pixels = decode_png(payload)
    elif kind == "image/bmp":
        w, h, _c, pixels = decode_bmp(payload)
    else:
        raise ValueError(f"unknown media kind: {payload[:8]!r}")
    return {
        "kind": kind, "width": w, "height": h,
        "pixel_sum": int(np.frombuffer(pixels, dtype=np.uint8).sum(dtype=np.int64)),
        "n_frames": None, "sample_rate": None, "sample_abs_sum": None,
    }


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real media bytes -> integer features (see module doc)."""
    media = media_documents(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features_of(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            for col in ("width", "height", "n_frames", "sample_rate"):
                out[col] = out[col].astype("Int32")
            for col in ("pixel_sum", "sample_abs_sum"):
                out[col] = out[col].astype("Int64")
            yield out

    return media.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


#: fixed thumbnail geometry for the resize operator — a model-input
#: normalization step (every image, whatever its source size, becomes
#: the same tensor shape)
RESIZE_TH, RESIZE_TW = 8, 8

MEDIA_RESIZE_SCHEMA = (
    "doc_id BIGINT, kind STRING, out_h INT, out_w INT, "
    "r_sum BIGINT, g_sum BIGINT, b_sum BIGINT"
)


def resize_nn(img: "np.ndarray", th: int, tw: int) -> "np.ndarray":
    """Nearest-neighbor resize of an (h, w, c) array to (th, tw, c) —
    target pixel (ty, tx) reads source (ty*h//th, tx*w//tw), the
    floor-mapping convention mirrored exactly by the SQL oracle. Pure
    integer index arithmetic + one fancy-index per axis: vectorized for
    any image size, and works for both up- and down-sampling."""
    h, w = img.shape[:2]
    iy = (np.arange(th) * h) // th
    ix = (np.arange(tw) * w) // tw
    return img[iy][:, ix]


def media_resized_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every image payload, nearest-neighbor-resize it to the
    fixed RESIZE_TH x RESIZE_TW thumbnail, and emit per-channel sums of
    the RESIZED pixels. The audio rows are pruned at the documents scan
    (see media_documents), so no WAV bytes are ever synthesized or
    shipped for this operator.

    The oracle predicts the channel sums by evaluating the generator
    formulas at the nearest-neighbor source coordinates over a
    generate_series grid — so the gate checks decode AND the resize
    index mapping value-exactly, without the oracle seeing any bytes."""
    media = media_documents(spark, sf_dir, only_images=True)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "kind": [],
                "r_sum": [], "g_sum": [], "b_sum": [],
            }
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                kind = sniff_kind(data)
                if kind == "image/png":
                    w, h, _c, pixels = decode_png(data)
                else:
                    w, h, _c, pixels = decode_bmp(data)
                img = np.frombuffer(pixels, np.uint8).reshape(h, w, 3)
                small = resize_nn(img, RESIZE_TH, RESIZE_TW)
                sums = small.sum(axis=(0, 1), dtype=np.int64)
                out["doc_id"].append(int(did))
                out["kind"].append(kind)
                out["r_sum"].append(int(sums[0]))
                out["g_sum"].append(int(sums[1]))
                out["b_sum"].append(int(sums[2]))
            if out["doc_id"]:
                res = pd.DataFrame(out)
                res.insert(2, "out_h", np.int32(RESIZE_TH))
                res.insert(3, "out_w", np.int32(RESIZE_TW))
                yield res

    return media.mapInPandas(resize, MEDIA_RESIZE_SCHEMA)


#: 256-entry palette with per-channel affine formulas, so the oracle
#: can predict palette-mapped sums without seeing the color table
GIF_PALETTE = bytes(
    b
    for i in range(256)
    for b in ((5 * i + 11) % 256, (3 * i + 1) % 256, (7 * i + 5) % 256)
)

MEDIA_GIF_SCHEMA = (
    "doc_id BIGINT, kind STRING, width INT, height INT, "
    "idx_sum BIGINT, r_sum BIGINT, g_sum BIGINT, b_sum BIGINT"
)


def synth_gif_payload(doc_id: int) -> bytes:
    """LZW-compressed GIF89a: w=5+id%28, h=4+id%23,
    idx(x,y) = (id + 3x + 5y) % 256 over GIF_PALETTE."""
    w, h = 5 + doc_id % 28, 4 + doc_id % 23
    y, x = np.mgrid[0:h, 0:w]
    idx = ((doc_id + 3 * x + 5 * y) % 256).astype(np.uint8)
    return encode_gif(w, h, idx.tobytes(), GIF_PALETTE)


def media_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-image decode end-to-end: every document gets a REAL
    GIF89a payload (the from-scratch LZW encoder in codecs.py), the
    extractor sniffs + LZW-decodes it back and palette-maps the indices
    to per-channel sums.  The oracle predicts every feature from the
    closed-form index/palette formulas without seeing any bytes — the
    gate therefore proves the variable-width LZW round trip is
    value-exact, the same contract as the PNG/BMP/WAV decode gate."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload = synth_gif_payload(did)
                kind = sniff_kind(payload)
                w, h, idx_b, pal_b = decode_gif(payload)
                idx = np.frombuffer(idx_b, np.uint8).astype(np.int64)
                rgb = np.frombuffer(pal_b, np.uint8).reshape(256, 3).astype(np.int64)[idx]
                rows.append(
                    (did, kind, w, h, int(idx.sum()),
                     int(rgb[:, 0].sum()), int(rgb[:, 1].sum()), int(rgb[:, 2].sum()))
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "width", "height",
                         "idx_sum", "r_sum", "g_sum", "b_sum"],
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return d.mapInPandas(extract, MEDIA_GIF_SCHEMA)


def media_gif_oracle_sql() -> str:
    """Closed-form index/palette sums (no bytes)."""
    return """
WITH img AS (
  SELECT doc_id, 5 + doc_id % 28 AS w, 4 + doc_id % 23 AS h FROM documents
),
gx AS (SELECT *, unnest(range(0, w)) AS x FROM img),
grid AS (SELECT *, unnest(range(0, h)) AS y FROM gx),
px AS (SELECT doc_id, w, h, (doc_id + 3*x + 5*y) % 256 AS idx FROM grid)
SELECT doc_id, 'image/gif' AS kind,
       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
       CAST(sum(idx) AS BIGINT) AS idx_sum,
       CAST(sum((5*idx + 11) % 256) AS BIGINT) AS r_sum,
       CAST(sum((3*idx + 1) % 256) AS BIGINT) AS g_sum,
       CAST(sum((7*idx + 5) % 256) AS BIGINT) AS b_sum
FROM px GROUP BY doc_id
"""


def media_resize_oracle_sql() -> str:
    """Closed-form per-channel sums of the 8x8 NN thumbnail."""
    return f"""
WITH img AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1 THEN 4 + doc_id % 13 ELSE 2 + doc_id % 5 END AS w,
         CASE WHEN doc_id % 3 = 1 THEN 3 + doc_id % 11 ELSE 2 + doc_id % 4 END AS h,
         CASE WHEN doc_id % 3 = 1 THEN 'image/png' ELSE 'image/bmp' END AS kind
  FROM documents WHERE doc_id % 3 <> 0
),
gx AS (SELECT *, unnest(range(0, {RESIZE_TW})) AS tx FROM img),
grid AS (SELECT *, unnest(range(0, {RESIZE_TH})) AS ty FROM gx),
src AS (
  SELECT doc_id, kind, (ty*h)//{RESIZE_TH} AS sy, (tx*w)//{RESIZE_TW} AS sx
  FROM grid
)
SELECT doc_id, kind,
       CAST({RESIZE_TH} AS INT) AS out_h, CAST({RESIZE_TW} AS INT) AS out_w,
       CAST(sum((doc_id + sx + 2*sy) % 256) AS BIGINT) AS r_sum,
       CAST(sum((2*doc_id + 3*sx + sy) % 256) AS BIGINT) AS g_sum,
       CAST(sum((3*doc_id + 5*sx + 7*sy) % 256) AS BIGINT) AS b_sum
FROM src GROUP BY doc_id, kind
"""


def media_features_oracle_sql() -> str:
    """Closed-form predictions of the decoded features (no bytes)."""
    rgb_sum = (
        "(doc_id + x + 2*y) % 256 + (2*doc_id + 3*x + y) % 256"
        " + (3*doc_id + 5*x + 7*y) % 256"
    )
    return f"""
WITH ids AS (SELECT doc_id FROM documents),
img AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1 THEN 4 + doc_id % 13 ELSE 2 + doc_id % 5 END AS w,
         CASE WHEN doc_id % 3 = 1 THEN 3 + doc_id % 11 ELSE 2 + doc_id % 4 END AS h,
         CASE WHEN doc_id % 3 = 1 THEN 'image/png' ELSE 'image/bmp' END AS kind
  FROM ids WHERE doc_id % 3 <> 0
),
img_x AS (SELECT doc_id, kind, w, h, unnest(range(0, w)) AS x FROM img),
img_xy AS (SELECT doc_id, kind, w, h, x, unnest(range(0, h)) AS y FROM img_x),
img_feat AS (
  SELECT doc_id, kind, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
         CAST(sum({rgb_sum}) AS BIGINT) AS pixel_sum
  FROM img_xy GROUP BY doc_id, kind
),
wav AS (
  SELECT doc_id, 400 + doc_id % 100 AS n FROM ids WHERE doc_id % 3 = 0
),
wav_i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM wav),
wav_feat AS (
  SELECT doc_id, CAST(max(n) AS INT) AS n_frames,
         CAST(sum(abs(((31*doc_id + 17*i) % 4096) - 2048)) AS BIGINT) AS sample_abs_sum
  FROM wav_i GROUP BY doc_id
)
SELECT doc_id, kind, width, height, pixel_sum,
       CAST(NULL AS INT) AS n_frames, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS BIGINT) AS sample_abs_sum
FROM img_feat
UNION ALL
SELECT doc_id, 'audio/wav', CAST(NULL AS INT), CAST(NULL AS INT),
       CAST(NULL AS BIGINT), n_frames, CAST(8000 AS INT), sample_abs_sum
FROM wav_feat
"""


MEDIA_JPEG_SCHEMA = (
    "doc_id BIGINT, kind STRING, width INT, height INT, "
    "blocks INT, pix_sum BIGINT"
)


def synth_jpeg_payload(doc_id: int) -> bytes:
    """Baseline JFIF built from uniform 8x8 tiles: bw=1+id%4 x bh=1+id%3
    tiles, tile (tx,ty) filled with v=(17*id + 29*tx + 53*ty) % 256.

    Uniform tiles make the lossy codec integer-exact (DC-only blocks,
    DQT[0]=8 — see jpeg.py docstring) while still exercising the whole
    real bitstream: Huffman tables, zigzag, byte stuffing and the
    differential DC chain across blocks in raster order.
    """
    bw, bh = 1 + doc_id % 4, 1 + doc_id % 3
    w, h = 8 * bw, 8 * bh
    ty, tx = np.mgrid[0:bh, 0:bw]
    tiles = ((17 * doc_id + 29 * tx + 53 * ty) % 256).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    return encode_jpeg(w, h, img.tobytes())


def media_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-codec decode end-to-end: every document gets a REAL baseline
    JPEG payload (jpeg.py's from-scratch encoder), the extractor sniffs
    the JFIF magic and entropy-decodes it back (canonical Huffman from
    the file's own DHT segments, dequant, IDCT).  The oracle predicts
    the pixel sums from the closed-form tile formula without seeing any
    bytes — exact because uniform tiles survive quantization losslessly."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload = synth_jpeg_payload(did)
                kind = sniff_kind(payload)
                w, h, gray = decode_jpeg(payload)
                pix = np.frombuffer(gray, np.uint8).astype(np.int64)
                rows.append(
                    (did, kind, w, h, (w // 8) * (h // 8), int(pix.sum()))
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "width", "height",
                         "blocks", "pix_sum"],
            )
            for c in ("width", "height", "blocks"):
                out[c] = out[c].astype("Int32")
            yield out

    return d.mapInPandas(extract, MEDIA_JPEG_SCHEMA)


def media_jpeg_oracle_sql() -> str:
    """Closed-form tile sums (no bytes): 64 pixels per uniform tile."""
    return """
WITH img AS (
  SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh FROM documents
),
gx AS (SELECT *, unnest(range(0, bw)) AS tx FROM img),
grid AS (SELECT *, unnest(range(0, bh)) AS ty FROM gx),
tile AS (
  SELECT doc_id, bw, bh, (17*doc_id + 29*tx + 53*ty) % 256 AS v FROM grid
)
SELECT doc_id, 'image/jpeg' AS kind,
       CAST(8 * max(bw) AS INT) AS width, CAST(8 * max(bh) AS INT) AS height,
       CAST(max(bw) * max(bh) AS INT) AS blocks,
       CAST(64 * sum(v) AS BIGINT) AS pix_sum
FROM tile GROUP BY doc_id
"""


MEDIA_ADPCM_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_samples INT, n_blocks INT, "
    "recon_abs_sum BIGINT"
)

#: gate corpus block size: small enough that every doc spans MULTIPLE
#: blocks, so the oracle must replay the per-block state resets too
ADPCM_BLOCK = 33


def synth_adpcm_payload(doc_id: int) -> bytes:
    """WAV/IMA-ADPCM of n=64+id%32 PCM samples s_i=((31·id+17·i)%4096)−2048."""
    n = 64 + doc_id % 32
    i = np.arange(n, dtype=np.int64)
    pcm = (((31 * doc_id + 17 * i) % 4096) - 2048).astype(np.int16)
    return encode_wav_ima(8000, pcm, ADPCM_BLOCK)


def media_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy AUDIO decode end-to-end: every document gets a real
    IMA-ADPCM WAV (4-bit adaptive quantization, 4:1), the extractor
    parses the RIFF chunks and replays the nibble stream back to PCM.
    The oracle re-derives the reconstruction by REPLAYING the decode
    recurrence itself in a recursive CTE (step-table join, shift-ladder
    vpdiff, both clamps, per-block resets) — any single-branch deviation
    in quantizer or state walk breaks the hash."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload = synth_adpcm_payload(did)
                rate, pcm = decode_wav_ima(payload)
                assert rate == 8000
                n = len(pcm)
                rows.append(
                    (did, "audio/adpcm", n, -(-n // ADPCM_BLOCK),
                     int(np.abs(pcm.astype(np.int64)).sum()))
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "n_samples", "n_blocks",
                         "recon_abs_sum"],
            )
            for c in ("n_samples", "n_blocks"):
                out[c] = out[c].astype("Int32")
            yield out

    return d.mapInPandas(extract, MEDIA_ADPCM_SCHEMA)


def media_adpcm_oracle_sql() -> str:
    """The IMA decode recurrence replayed as SQL (see the prototype in
    tests/test_adpcm.py for the same recurrence against the codec)."""
    vals = ", ".join(f"({i}, {v})" for i, v in enumerate(ADPCM_STEP_TABLE))
    s2 = "(((31*doc_id + 17*(r.i+1)) % 4096) - 2048)"
    newp = ("CASE WHEN is_reset THEN s2 ELSE GREATEST(-32768, LEAST(32767, "
            "p + CASE WHEN diff < 0 THEN -vp ELSE vp END)) END")
    return f"""
WITH RECURSIVE steps(si, st) AS (VALUES {vals}),
docs AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
r AS (
  SELECT doc_id, n, 0 AS i,
         CAST(((31*doc_id) % 4096) - 2048 AS BIGINT) AS p,
         0 AS idx,
         CAST(abs(((31*doc_id) % 4096) - 2048) AS BIGINT) AS acc
  FROM docs
  UNION ALL
  SELECT doc_id, n, i2 AS i,
         {newp} AS p,
         CASE WHEN is_reset THEN 0
              ELSE GREATEST(0, LEAST(88, idx +
                   CASE WHEN delta < 4 THEN -1 ELSE 2*(delta-3) END)) END AS idx,
         acc + abs({newp}) AS acc
  FROM (
    SELECT *, (st//8) + st*b2 + (st//2)*b1 + (st//4)*b0 AS vp,
           4*b2 + 2*b1 + b0 AS delta
    FROM (
      SELECT *, CASE WHEN d3 >= st//4 THEN 1 ELSE 0 END AS b0
      FROM (
        SELECT *, CASE WHEN d2 >= st//2 THEN 1 ELSE 0 END AS b1,
               d2 - (st//2) * (CASE WHEN d2 >= st//2 THEN 1 ELSE 0 END) AS d3
        FROM (
          SELECT *, CASE WHEN ad >= st THEN 1 ELSE 0 END AS b2,
                 ad - st * (CASE WHEN ad >= st THEN 1 ELSE 0 END) AS d2
          FROM (
            SELECT r.*, steps.st, r.i + 1 AS i2,
                   CAST({s2} AS BIGINT) AS s2,
                   ((r.i + 1) % {ADPCM_BLOCK} = 0) AS is_reset,
                   CAST({s2} AS BIGINT) - r.p AS diff,
                   abs(CAST({s2} AS BIGINT) - r.p) AS ad
            FROM r JOIN steps ON steps.si = r.idx
            WHERE r.i + 1 < r.n
          )
        )
      )
    )
  )
)
SELECT doc_id, 'audio/adpcm' AS kind, CAST(n AS INT) AS n_samples,
       CAST((n + {ADPCM_BLOCK} - 1) // {ADPCM_BLOCK} AS INT) AS n_blocks,
       acc AS recon_abs_sum
FROM r WHERE i = n - 1
"""


# ---------------------------------------------------------------- mu-law
MEDIA_MULAW_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_samples INT, enc_sum BIGINT, "
    "recon_abs_sum BIGINT, max_err INT"
)


def synth_mulaw_payload(doc_id: int) -> bytes:
    """WAV/G.711 mu-law of n=96+id%64 PCM samples
    s_i=((37*id+23*i)%65536)-32768 — full 16-bit swing so every one of
    the 8 companding segments (and the clip branch) is exercised."""
    n = 96 + doc_id % 64
    i = np.arange(n, dtype=np.int64)
    pcm = (((37 * doc_id + 23 * i) % 65536) - 32768).astype(np.int16)
    return encode_wav_mulaw(8000, pcm)


def media_mulaw_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companded AUDIO round trip end-to-end: every document gets a
    real G.711 mu-law WAV (format tag 0x0007, 2:1), the extractor
    parses the RIFF chunks, expands the 8-bit codes back to PCM and
    reports code/reconstruction aggregates plus the worst per-sample
    error.  The oracle recomputes encode AND decode as a closed-form
    integer CASE ladder per sample (mulaw.py docstring) — bias, clip,
    segment ladder and ones-complement all gate-checked, no recursion
    needed because the codec is stateless per sample."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 96 + did % 64
                i = np.arange(n, dtype=np.int64)
                orig = ((37 * did + 23 * i) % 65536) - 32768
                payload = synth_mulaw_payload(did)
                rate, pcm = decode_wav_mulaw(payload)
                assert rate == 8000 and len(pcm) == n
                codes = np.frombuffer(
                    payload[payload.rindex(b"data") + 8:], dtype=np.uint8
                )[:n]
                err = np.abs(orig - pcm.astype(np.int64))
                rows.append(
                    (did, "audio/mulaw", n, int(codes.astype(np.int64).sum()),
                     int(np.abs(pcm.astype(np.int64)).sum()), int(err.max()))
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "n_samples", "enc_sum",
                         "recon_abs_sum", "max_err"],
            )
            for c in ("n_samples", "max_err"):
                out[c] = out[c].astype("Int32")
            yield out

    return d.mapInPandas(extract, MEDIA_MULAW_SCHEMA)


def media_mulaw_oracle_sql() -> str:
    """Per-sample closed-form mu-law encode+decode in SQL."""
    s = "(((37*doc_id + 23*i) % 65536) - 32768)"
    mag = "(LEAST(CASE WHEN s < 0 THEN -s ELSE s END, 32635) + 132)"
    e = ("(CASE WHEN mag >= 256 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 512 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 1024 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 2048 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 4096 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 8192 THEN 1 ELSE 0 END + "
         "CASE WHEN mag >= 16384 THEN 1 ELSE 0 END)")
    return f"""
WITH docs AS (SELECT doc_id, 96 + doc_id % 64 AS n FROM documents),
samp AS (
  SELECT doc_id, n, unnest(range(0, n)) AS i FROM docs
),
pre AS (
  SELECT doc_id, n, i, s, {mag} AS mag,
         CASE WHEN s < 0 THEN 1 ELSE 0 END AS sign
  FROM (SELECT doc_id, n, i, CAST({s} AS BIGINT) AS s FROM samp) q
),
seg AS (
  SELECT *, {e} AS e, (mag // (8 * (1 << {e}))) % 16 AS mant
  FROM pre
),
codec AS (
  SELECT doc_id, n, s,
         255 - (sign*128 + e*16 + mant) AS code,
         (CASE WHEN sign = 1 THEN -1 ELSE 1 END)
           * (((mant*8 + 132) * (1 << e)) - 132) AS dec
  FROM seg
)
SELECT doc_id, 'audio/mulaw' AS kind, CAST(n AS INT) AS n_samples,
       CAST(SUM(code) AS BIGINT) AS enc_sum,
       CAST(SUM(abs(dec)) AS BIGINT) AS recon_abs_sum,
       CAST(MAX(abs(s - dec)) AS INT) AS max_err
FROM codec GROUP BY doc_id, n
"""
