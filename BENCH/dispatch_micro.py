"""Interleaved single-core dispatcher microbench (the deterministic
tiebreaker of the bench protocol, established r6): measures
extract_document wall per doc over a FIXED mixed-format corpus, with no
Spark and no multiprocessing, so host steal shows up as slow samples
that min-of-R discards and A/B readings interleave across trees.

Two phases so both trees dispatch byte-identical payloads:

  # 1. write the corpus with the CURRENT tree's synth builders
  python BENCH/dispatch_micro.py write /tmp/micro.pkl \
      build_wpd build_dwg ...          # builder names in sparktika.synth

  # 2. run either tree over it (interleave invocations across trees)
  python BENCH/dispatch_micro.py run /root/repo /tmp/micro.pkl [reps]

`run` prints one JSON line {"label", "ms_per_doc", "samples"} where
ms_per_doc is the min over `reps` full-corpus passes (default 3).
A builder name prefixed with '*' is called as NAME(i) but the payload
url gets no extension hint (pure magic dispatch).
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

DOCS_PER_BUILDER = 25


def write(out: str, names: list[str]) -> None:
    import sparktika.synth as synth

    corpus: list[tuple[str, bytes]] = []
    skipped = []
    for name in names:
        fn = getattr(synth, name)
        try:
            fn(0)
        except TypeError:
            skipped.append(name)  # not a (doc_id)->bytes builder
            continue
        for i in range(DOCS_PER_BUILDER):
            corpus.append((f"https://x/{name}/{i}", fn(i)))
    if skipped:
        print(json.dumps({"skipped_non_docid_builders": skipped}),
              file=sys.stderr)
    # a slab of plain html/text pages keeps the mix dispatcher-realistic
    for i in range(4 * DOCS_PER_BUILDER):
        html = (f"<html><head><title>t{i}</title></head><body>"
                + "".join(f"<p>para {i} {j} word word word</p>"
                          for j in range(20))
                + "</body></html>").encode()
        corpus.append((f"https://x/html/{i}", html))
    with open(out, "wb") as f:
        pickle.dump(corpus, f)
    print(json.dumps({"written": out, "docs": len(corpus),
                      "bytes": sum(len(b) for _, b in corpus)}))


def run(tree: str, corpus_path: str, reps: int) -> None:
    sys.path.insert(0, os.path.abspath(tree))
    from sparktika.kernels.extract import extract_document

    with open(corpus_path, "rb") as f:
        corpus = pickle.load(f)
    # warm imports / JIT-ish caches outside the timed region
    for url, payload in corpus[:20]:
        extract_document(url, None, payload)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for url, payload in corpus:
            extract_document(url, None, payload)
        samples.append((time.perf_counter() - t0) * 1000 / len(corpus))
    print(json.dumps({"label": tree, "ms_per_doc": round(min(samples), 4),
                      "samples": [round(s, 4) for s in samples],
                      "docs": len(corpus)}))


if __name__ == "__main__":
    if sys.argv[1] == "write":
        write(sys.argv[2], sys.argv[3:])
    elif sys.argv[1] == "run":
        run(sys.argv[2], sys.argv[3],
            int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    else:
        raise SystemExit("usage: write <out> <builders...> | "
                         "run <tree> <corpus> [reps]")
