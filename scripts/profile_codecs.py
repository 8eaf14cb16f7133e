"""Profile the vendored JPEG / FLAC / PNG / WAV decode kernels per item
(guide §1: measure first). Reads payloads straight from the synth parquet
tables with pyarrow — no Spark — so the numbers are pure single-core codec
cost. Usage:

  python scripts/profile_codecs.py [jpeg|flac|png|wav|all] [n_items]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402


def _payloads(path: str, col: str = "payload", n: int = 200) -> list[bytes]:
    t = pq.read_table(path, columns=[col])
    return [v.as_py() for v in t.column(col)[:n]]


def _run(name, items, fn, profile_top=18):
    t0 = time.time()
    for it in items:
        fn(it)
    dt = time.time() - t0
    print(f"{name}: {len(items)} items in {dt:.3f}s = {dt/len(items)*1000:.3f} ms/item")
    pr = cProfile.Profile()
    pr.enable()
    for it in items:
        fn(it)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(profile_top)
    print("\n".join(s.getvalue().splitlines()[:profile_top + 8]))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    if which in ("jpeg", "png", "all"):
        from solana_etl_spark.functions import jpeg, png

        pays = _payloads("/root/repo/.synth_tables/img_v5_40000/images.parquet", n=60000)
        jpegs = [p for p in pays if p[:2] == b"\xff\xd8"][:n]
        pngs = [p for p in pays if p[:4] == b"\x89PNG"][:n]
        print(f"corpus sample: {len(jpegs)} jpeg, {len(pngs)} png available")
        if which in ("jpeg", "all") and jpegs:
            _run("jpeg", jpegs, lambda b: jpeg.open(io.BytesIO(b)).tobytes())
        if which in ("png", "all") and pngs:
            _run("png", pngs, lambda b: png.open(io.BytesIO(b)).tobytes())

    if which in ("flac", "wav", "all"):
        from solana_etl_spark.functions import flac, wav

        pays = _payloads("/root/repo/.synth_tables/wav_v3_20000/audio.parquet", n=2000)
        flacs = [p for p in pays if p[:4] == b"fLaC"][:n]
        wavs = [p for p in pays if p[:4] == b"RIFF"][:n]
        print(f"corpus sample: {len(flacs)} flac, {len(wavs)} wav available")
        if which in ("flac", "all") and flacs:
            _run("flac", flacs, flac.decode)
        if which in ("wav", "all") and wavs:
            _run("wav", wavs, wav.decode)


if __name__ == "__main__":
    main()
