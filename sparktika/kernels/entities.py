"""Lenient HTML character-reference decoding.

Named subset + numeric (&#123; / &#xAB;) references. Unknown or malformed
references are left verbatim (tag-soup tolerance). Python's full
`html.entities` table is intentionally not used so the supported set is an
explicit, frozen part of the kernel spec.
"""

from __future__ import annotations

NAMED = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "lsquo": "‘",
    "rsquo": "’",
    "ldquo": "“",
    "rdquo": "”",
    "laquo": "«",
    "raquo": "»",
    "deg": "°",
    "plusmn": "±",
    "middot": "·",
    "bull": "•",
    "sect": "§",
    "para": "¶",
    "euro": "€",
    "pound": "£",
    "yen": "¥",
    "cent": "¢",
    "times": "×",
    "divide": "÷",
    "eacute": "é",
    "egrave": "è",
    "agrave": "à",
    "ccedil": "ç",
    "uuml": "ü",
    "ouml": "ö",
    "auml": "ä",
    "szlig": "ß",
    "ntilde": "ñ",
}

_MAX_REF_LEN = 32


def decode_entities(s: str) -> str:
    """Decode character references; leave anything unrecognized verbatim."""
    if "&" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        out.append(s[i:amp])
        semi = s.find(";", amp + 1, amp + 1 + _MAX_REF_LEN)
        if semi == -1:
            out.append("&")
            i = amp + 1
            continue
        body = s[amp + 1 : semi]
        decoded = None
        if body.startswith("#"):
            num = body[1:]
            try:
                cp = int(num[1:], 16) if num[:1] in ("x", "X") else int(num)
                if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                    decoded = chr(cp)
            except ValueError:
                decoded = None
        else:
            decoded = NAMED.get(body)
        if decoded is not None:
            out.append(decoded)
            i = semi + 1
        else:
            out.append("&")
            i = amp + 1
    return "".join(out)
