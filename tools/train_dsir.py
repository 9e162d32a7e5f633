"""Offline fit for sparktika.pipeline.dsir.LOG_RATIO_SCALED.

Bag-of-hashed-bigram importance ratios (Xie et al. 2023): count bucket
occurrences with add-one smoothing over 20,000 synthetic pages from
dsir_page_text with ids 300000..319999 (disjoint from every gate/test
id range) — TARGET = the kind-0 formal-prose pages, PROPOSAL = the
full three-way mixture — then quantize  ln(p_h / q_h) * SCALE  to
integers and paste into dsir.py by hand. Reports the resulting
per-kind weight ranges and acceptance rates on a held-out id range so
the ramp scale can be sanity-checked.

Run from the repo root:  python tools/train_dsir.py
"""

from __future__ import annotations

import hashlib

import numpy as np

from sparktika.pipeline.dsir import RAMP_HALF, dsir_page_text
from sparktika.pipeline.quality_model import N_BUCKETS

SCALE = 3_000


def featurize(text: str) -> np.ndarray:
    toks = [x for x in text.split(" ") if x]
    v = np.zeros(N_BUCKETS, dtype=np.float64)
    if len(toks) < 2:
        return v
    f = np.fromiter((7 * len(x) + ord(x[0]) for x in toks),
                    dtype=np.int64, count=len(toks))
    np.add.at(v, (f[:-1] * 31 + f[1:]) % N_BUCKETS, 1.0)
    return v


def main() -> None:
    tgt = np.ones(N_BUCKETS)      # add-one smoothing
    prop = np.ones(N_BUCKETS)
    for i in range(300_000, 320_000):
        v = featurize(dsir_page_text(i))
        prop += v
        if i % 3 == 0:
            tgt += v
    p = tgt / tgt.sum()
    q = prop / prop.sum()
    ratios = np.round(np.log(p / q) * SCALE).astype(np.int64)

    print("LOG_RATIO_SCALED = [")
    for r in range(0, N_BUCKETS, 8):
        print("    " + ", ".join(str(int(x)) for x in ratios[r:r + 8])
              + ",")
    print("]")

    # held-out diagnostics: per-kind weight ranges + acceptance rates
    for kind in (0, 1, 2):
        ws, acc = [], 0
        ids = [i for i in range(330_000, 333_000) if i % 3 == kind]
        for i in ids:
            f = featurize(dsir_page_text(i)).astype(np.int64)
            w = int((f * ratios).sum())
            ws.append(w)
            t = min(max(RAMP_HALF + w, 0), 2 * RAMP_HALF - 1)
            u = int(hashlib.md5(f"{i}:dsir".encode()).hexdigest()[:5], 16)
            acc += u < t
        print(f"kind {kind}: weight [{min(ws)}, {max(ws)}] "
              f"accept {acc}/{len(ids)} = {acc / len(ids):.3f}")


if __name__ == "__main__":
    main()
