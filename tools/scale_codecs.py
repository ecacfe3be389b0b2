"""Compression-codec payload-growth measurement (the q408 discipline).

q444/q447's catalog fixtures bound payloads at ~48 small shards, so the
fixture queries never exercise the codecs' real growth axis: bytes
compressed+decompressed per executor task.  This harness measures the
full compress -> decompress round trip for the three round-9 pure-
stdlib codecs (zstd, lz4 frame, snappy block) over a repetitive-text
payload grown x1 / x10 / x100, on executors via mapInPandas (one
payload per task), warm pass reported.

The number that matters at 100 TB: per-byte cost must stay flat (the
codecs are single-pass streaming with bounded state), so wall should
scale ~linearly in payload bytes.  Usage:
python tools/scale_codecs.py [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_dataframe_spark.context import get_spark


BASE = 64 * 1024  # 64 KB of repetitive text per shard at x1


def _measure(spark, codec: str, mult: int) -> tuple[float, float, int]:
    """Returns (wall seconds, compressed ratio, payload bytes) for 8
    parallel shards of BASE * mult bytes each."""
    n = BASE * mult
    docs = spark.range(8)

    def work(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.lz4 import (
            lz4_frame_compress,
            lz4_frame_decompress,
        )
        from rust_dataframe_spark.operators.snappy import (
            snappy_compress,
            snappy_uncompress,
        )
        from rust_dataframe_spark.operators.zstd import (
            zstd_compress,
            zstd_decompress,
        )

        for pdf in batches:
            outs = []
            for i in pdf["id"]:
                i = int(i)
                words = [f"shard{i} token{k} " for k in range(50)]
                buf = bytearray()
                k = 0
                while len(buf) < n:
                    buf += words[k % 50].encode()
                    k += 1
                data = bytes(buf[:n])
                if codec == "zstd":
                    blob = zstd_compress(data)
                    back = zstd_decompress(blob)
                elif codec == "lz4":
                    blob = lz4_frame_compress(data)
                    back = lz4_frame_decompress(blob)
                else:
                    blob = snappy_compress(data)
                    back = snappy_uncompress(blob)
                assert back == data
                outs.append((i, len(blob)))
            yield pd.DataFrame(outs, columns=["id", "clen"])

    t0 = time.time()
    rows = docs.mapInPandas(work, "id long, clen long").collect()
    wall = time.time() - t0
    ratio = sum(r["clen"] for r in rows) / (8 * n)
    return wall, ratio, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark()
    results = {}
    for codec in ("zstd", "lz4", "snappy"):
        _measure(spark, codec, 1)  # warm pass (JIT + import)
        rows = []
        for mult in (1, 10, 100):
            wall, ratio, n = _measure(spark, codec, mult)
            mbps = 8 * n / wall / 1e6
            rows.append(
                {"mult": mult, "payload_kb": n // 1024,
                 "wall_s": round(wall, 2), "ratio": round(ratio, 3),
                 "mb_per_s": round(mbps, 1)}
            )
            print(f"{codec} x{mult}: {wall:.2f}s ratio={ratio:.3f} "
                  f"{mbps:.1f} MB/s (8 shards x {n // 1024} KB)")
        results[codec] = rows
    print(json.dumps({"codec_scale": results}))


if __name__ == "__main__":
    main()
