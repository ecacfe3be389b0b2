"""Catalog round 6: real JPEG decode, filtered ANN, schema evolution.

Continues the multimodal real-decode program (q327 PNG / q333 WAV / q334
GIF) with baseline JPEG (operators/jpeg.py — the last image container
that was fake-decoded), adds the metadata-filtered vector-search shape
(predicate + IVF probe with a measured recall certificate, the q329
discipline), and models schema drift across parquet vintages (mergeSchema
read + an explicit audited migration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q387: real JPEG round-trip with closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q387_jpeg_decode",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 3) AS h
               FROM documents WHERE doc_id < 200),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 8)) AS by FROM bx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(64 * ((doc_id + 17 * bx + 29 * by) % 256)) AS BIGINT)
             AS px_sum
    FROM b GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def q387_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, driver-checkable (operators/jpeg.py — round 6's
    pure-stdlib baseline codec: marker parse, canonical Huffman entropy
    decode, dequant, 8x8 IDCT): each doc synthesizes a BLOCK-CONSTANT
    grayscale image (block (bx, by) holds (doc_id + 17bx + 29by) % 256),
    encodes it with the all-ones quant table, decodes the real
    entropy-coded bytes back, and reports the decoded pixel checksum —
    which for block-constant content is EXACTLY the closed form the
    DuckDB oracle computes, because a constant block survives
    FDCT -> quantize -> Huffman -> IDCT bit-exactly (DC-only; AC residues
    ~1e-13 quantize to zero — see the jpeg.py module docstring).  Lossy
    general content and the 4:2:0/RGB paths are tolerance-pinned in
    tests/test_llm_ops.py::TestJpegReal.  All work is Arrow-batched
    mapInPandas on executors; the driver never sees image bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def gen_and_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import decode_jpeg, encode_jpeg

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 3)
                px = bytes(
                    (d + 17 * (x // 8) + 29 * (y // 8)) % 256
                    for y in range(h)
                    for x in range(w)
                )
                ww, hh, _ch, out = decode_jpeg(encode_jpeg(w, h, px, channels=1))
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["px_sum"].append(sum(out))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode, "doc_id bigint, width int, height int, px_sum bigint"
    ).orderBy("doc_id")
