"""Catalog round 7: progressive JPEG decode + unigram-EM training loop.

Closes the two largest round-6 verdict items that add catalog surface:
the SOF2 decode path (the biggest remaining share of the multimodal
fake-decode fallback — operators/jpeg.py now covers the full T.81
Annex G Huffman scan matrix) and the composed EM training loop over the
q336/q392 E/M steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q395: progressive (SOF2) JPEG round-trip with closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q395_progressive_jpeg",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 3) AS h
               FROM documents WHERE doc_id < 200),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 8)) AS by FROM bx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(64 * ((doc_id + 13 * bx + 31 * by) % 256)) AS BIGINT)
             AS px_sum
    FROM b GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def q395_progressive_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode, driver-checkable — q387's discipline
    on the SOF2 path (operators/jpeg.py round 7: multi-scan coefficient
    accumulation across interleaved DC first + DC successive-approximation
    refinement + AC spectral-selection first + AC refinement scans, then
    one dequant/IDCT pass): each doc synthesizes a BLOCK-CONSTANT
    grayscale image (block (bx, by) holds (doc_id + 13bx + 31by) % 256),
    encodes it with encode_jpeg_progressive's 7-scan script at the
    all-ones quant table, decodes the real multi-scan entropy bytes back,
    and reports the decoded pixel checksum — exactly the closed form the
    DuckDB oracle computes, because block-constant content is DC-only and
    the DC path restores full precision after the Al=1 -> refinement
    ladder (jpeg.py module docstring).  Lossy general content and the
    color/4:2:0 progressive paths are equality-pinned against the
    baseline decoder in tests/test_llm_ops.py::TestJpegProgressive.
    All work is Arrow-batched mapInPandas on executors; the driver never
    sees image bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def gen_and_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 3)
                px = bytes(
                    (d + 13 * (x // 8) + 31 * (y // 8)) % 256
                    for y in range(h)
                    for x in range(w)
                )
                ww, hh, _ch, out = decode_jpeg(
                    encode_jpeg_progressive(w, h, px, channels=1)
                )
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["px_sum"].append(sum(out))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode, "doc_id bigint, width int, height int, px_sum bigint"
    ).orderBy("doc_id")
