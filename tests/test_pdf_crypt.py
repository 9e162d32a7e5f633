"""PDF standard security handler (kernels/pdfcrypt.py + pdf.py hookup).

The AES core is DERIVED (S-box from GF(2^8) inverse + affine; no table
transcribed from memory) and pinned here against public known-answer
vectors: FIPS-197 Appendix C block vectors and classic RC4 vectors. The
handler path is exercised end-to-end over the deterministic encrypted
corpus (synth.build_pdf_encrypted) for every variant the builder emits:
R2/RC4-40, R3/RC4-128, R4/AESV2, R6/AESV3.
"""

import hashlib
import struct

import pytest

from sparktika.kernels import pdfcrypt as pc
from sparktika.kernels.extract import extract_document
from sparktika.synth import SYNTH_CONFIG, build_pdf_encrypted


def _extract(data: bytes, name: str = "doc.pdf"):
    return extract_document(f"https://x.example/{name}", None, data,
                            SYNTH_CONFIG)


# -- crypto known-answer vectors (public: FIPS-197, SP 800-38A era) --------

def test_aes128_fips197_vector():
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pc._expand_key(key)
    ct = pc._encrypt_block(rk, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert pc._decrypt_block(rk, ct) == pt


def test_aes256_fips197_vector():
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pc._expand_key(key)
    ct = pc._encrypt_block(rk, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert pc._decrypt_block(rk, ct) == pt


def test_sbox_is_derived_permutation():
    assert sorted(pc._SBOX) == list(range(256))
    assert pc._SBOX[0] == 0x63  # affine constant on inverse(0)=0
    assert all(pc._INV_SBOX[pc._SBOX[x]] == x for x in range(256))


def test_rc4_vectors():
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert pc.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    # involution: same keystream both directions
    assert pc.rc4(b"k", pc.rc4(b"k", b"payload bytes")) == b"payload bytes"


def test_cbc_roundtrip_and_padding():
    key = hashlib.sha256(b"k").digest()[:16]
    iv = bytes(16)
    data = b"0123456789abcdef" * 3
    assert pc.aes_cbc_decrypt(key, iv, pc.aes_cbc_encrypt(key, iv, data)) == data
    padded = pc._pad_pkcs5(b"abc")
    assert len(padded) % 16 == 0 and pc._strip_pkcs5(padded) == b"abc"
    with pytest.raises(Exception):
        pc._strip_pkcs5(b"\x00" * 16)  # 0 is not a valid pad byte


# -- end-to-end over the deterministic encrypted corpus --------------------

@pytest.mark.parametrize("doc_id", list(range(8)) + [100, 101, 102, 103])
def test_encrypted_pdf_all_variants(doc_id):
    r = _extract(build_pdf_encrypted(doc_id), f"{doc_id}.pdf")
    assert r.status == "ok", r.error
    assert r.text_extracted == f"Secret note {doc_id}." + "\n" * 5
    assert r.title == f"Secret {doc_id}"
    assert r.content_type_detected == "application/pdf"


def _build_user_password_pdf() -> bytes:
    """V2/R3 PDF whose USER password is non-empty: empty-password auth
    must fail and the row must refuse honestly."""
    user_pw, owner_pw = b"real-password", b"owner"
    id0 = hashlib.md5(b"locked").digest()
    P = -3904
    O = pc.compute_O(owner_pw, user_pw, 3, 16)
    key = pc.derive_key_classic(user_pw, O, P, id0, 3, 16)
    U = pc.compute_U(key, 3, id0)
    stream = b"BT /F1 12 Tf 72 720 Td (locked text) Tj ET"
    ext = struct.pack("<I", 4)[:3] + b"\x00\x00"
    k = hashlib.md5(key + ext).digest()[:16]
    enc_stream = pc.rc4(k, stream)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(enc_stream)).encode()
        + b" >>\nstream\n" + enc_stream + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -3904 /O <"
        + O.hex().encode() + b"> /U <" + U.hex().encode() + b"> >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Encrypt 5 0 R /ID [<"
        + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] >>\n"
        b"startxref\n0\n%%EOF\n")


def test_user_password_required_refuses():
    r = _extract(_build_user_password_pdf(), "locked.pdf")
    assert r.status == "unsupported"
    assert r.metadata.get("encryption") == ["password-required"]
    assert not r.text_extracted  # never garbage text


def test_unsupported_security_handler_refuses():
    data = _build_user_password_pdf().replace(b"/Filter /Standard",
                                              b"/Filter /AcmeDRM")
    r = _extract(data, "drm.pdf")
    assert r.status == "unsupported"
    assert r.metadata.get("encryption") == ["unsupported-security-handler"]


def test_unknown_cfm_refuses():
    data = build_pdf_encrypted(2).replace(b"/CFM /AESV2", b"/CFM /AESV9")
    r = _extract(data, "cfm.pdf")
    assert r.status == "unsupported"
    assert r.metadata.get("encryption") == ["unsupported-cfm"]


def test_custom_named_crypt_filter_refuses():
    # /StmF naming a filter other than StdCF/Identity must refuse —
    # mapping it to Identity would emit raw ciphertext as text
    data = build_pdf_encrypted(2).replace(b"/StmF /StdCF", b"/StmF /Acme")
    r = _extract(data, "stmf.pdf")
    assert r.status == "unsupported"
    assert r.metadata.get("encryption") == ["unsupported-cfm"]
    assert not r.text_extracted


def test_truncation_sweep_never_raises():
    for doc_id in range(4):  # one doc per variant
        full = build_pdf_encrypted(doc_id)
        for cut in range(16, len(full), 61):
            r = _extract(full[:cut], f"t{doc_id}-{cut}.pdf")
            assert r.status in ("ok", "truncated", "failed", "unsupported",
                                "timeout")


def test_corrupt_ciphertext_never_raises():
    for doc_id in (2, 3):  # the AES variants: bad padding must be a row
        full = bytearray(build_pdf_encrypted(doc_id))
        start = bytes(full).index(b"stream\n") + 7
        for off in (0, 5, 17, 40):
            data = bytearray(full)
            data[start + off] ^= 0xFF
            r = _extract(bytes(data), f"c{doc_id}-{off}.pdf")
            assert r.status in ("ok", "failed", "unsupported")


def test_r6_hash_matches_r5_shortcut_shape():
    # R5 path is single SHA-256; R6 runs the hardened loop — both 32 bytes
    assert len(pc.hash_r6(b"pw", b"saltsalt", b"", 5)) == 32
    assert len(pc.hash_r6(b"pw", b"saltsalt", b"", 6)) == 32
    assert pc.hash_r6(b"pw", b"saltsalt", b"", 5) == hashlib.sha256(
        b"pw" + b"saltsalt").digest()


def test_encrypted_metadata_title_decrypts_per_object():
    # Title lives in object 6, content in object 4 — distinct per-object
    # keys; a swap of the two ciphertexts must NOT decrypt correctly
    # (catches any all-objects-one-key shortcut)
    r = _extract(build_pdf_encrypted(1), "meta.pdf")
    assert r.title == "Secret 1"
