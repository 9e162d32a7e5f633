"""Offline trainer for sparktika.pipeline.quality_model.

Logistic regression over hashed-bigram counts (plain numpy, no
sklearn), trained on 20,000 synthetic pages from quality_page_text
with ids 100000..119999 — disjoint from every gate/test id range —
labels = the generator's planted good/spam parity. Weights are
quantized to ppm integers (scale 1e6 / 50 keeps every |logit| well
inside int64 for any plausible page length) and pasted into
quality_model.py by hand; a held-out range (200000..200999) reports
generalization.

Run from the repo root:  python tools/train_quality_model.py
"""

from __future__ import annotations

import numpy as np

from sparktika.pipeline.quality_model import (
    N_BUCKETS,
    quality_page_text,
)


def featurize(text: str) -> np.ndarray:
    toks = [x for x in text.split(" ") if x]
    v = np.zeros(N_BUCKETS, dtype=np.float64)
    if len(toks) < 2:
        return v
    f = np.fromiter((7 * len(x) + ord(x[0]) for x in toks),
                    dtype=np.int64, count=len(toks))
    np.add.at(v, (f[:-1] * 31 + f[1:]) % N_BUCKETS, 1.0)
    return v


def build(ids: range) -> tuple[np.ndarray, np.ndarray]:
    X = np.stack([featurize(quality_page_text(i)) for i in ids])
    y = np.array([1.0 if i % 2 == 0 else 0.0 for i in ids])
    return X, y


def main() -> None:
    rng = np.random.default_rng(0)
    X, y = build(range(100_000, 120_000))
    w = rng.normal(0, 0.01, N_BUCKETS)
    b = 0.0
    lr, n = 0.1, len(y)
    for epoch in range(400):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * g.mean()
    acc = ((X @ w + b > 0) == (y > 0.5)).mean()
    Xh, yh = build(range(200_000, 201_000))
    acc_h = ((Xh @ w + b > 0) == (yh > 0.5)).mean()
    scale = 1e6 / 50
    wq = np.round(w * scale).astype(np.int64)
    bq = int(round(b * scale))
    accq = ((X @ wq + bq > 0) == (y > 0.5)).mean()
    acc_hq = ((Xh @ wq + bq > 0) == (yh > 0.5)).mean()
    print(f"train acc float={acc:.4f} quantized={accq:.4f}")
    print(f"held-out acc float={acc_h:.4f} quantized={acc_hq:.4f}")
    print(f"BIAS_PPM = {bq}")
    print("WEIGHTS_PPM = [")
    for i in range(0, N_BUCKETS, 8):
        print("    " + ", ".join(str(v) for v in wq[i:i + 8]) + ",")
    print("]")


if __name__ == "__main__":
    main()
