"""Outlook ``.msg`` reader: [MS-OXMSG] property streams out of the OLE2
container the legacy-Office readers already parse.

A ``.msg`` file is an [MS-CFB] compound file whose MAPI properties live
in streams named ``__substg1.0_PPPPTTTT`` (``PPPP`` = property id,
``TTTT`` = type: ``001F`` UTF-16LE string, ``001E`` byte string,
``0102`` binary). This reader reuses :class:`..doc_legacy.CompoundFile`
and maps the envelope + body properties to the same document shape the
``.eml`` reader produces:

* ``0037`` Subject → ``# <subject>`` header;
* ``0C1A`` sender name / ``0E04`` display-to → envelope paragraph;
* ``1000`` plain body → markdown-parsed elements, else ``1013`` HTML
  body through the HTML reader.

Attachment sub-storages (``__attach_version1.0_#N``) are NOT recursed:
the compound-file directory is scanned flat (no storage hierarchy), so
same-named inner streams are ambiguous — a loud documented limit, same
altitude as markitdown's msg conversion (headers + body).
"""

from __future__ import annotations

from typing import List, Optional

from .doc_legacy import CompoundFile
from .markdown import parse_markdown


def _prop(cfb: CompoundFile, pid: str) -> Optional[str]:
    """First decodable value of a property id across the string types."""
    for t, codec in (("001F", "utf-16-le"), ("001E", "cp1252")):
        name = f"__substg1.0_{pid}{t}"
        if name in cfb.entries:
            try:
                return cfb.stream(name).decode(codec).rstrip("\x00")
            except Exception:
                continue
    return None


def parse_msg(data: bytes, doc_id: str) -> List[dict]:
    cfb = CompoundFile(bytes(data))
    if not any(n.startswith("__substg1.0_") for n in cfb.entries):
        raise ValueError(f"{doc_id}: OLE2 file has no MAPI property streams")
    subject = (_prop(cfb, "0037") or "(no subject)").strip() or "(no subject)"
    md_parts = [f"# {subject}"]
    env = []
    sender = _prop(cfb, "0C1A")
    to = _prop(cfb, "0E04")
    if sender:
        env.append(f"**From:** {sender}")
    if to:
        env.append(f"**To:** {to}")
    if env:
        md_parts.append("  \n".join(env))
    body = _prop(cfb, "1000")
    if body and body.strip():
        md_parts.append(body.strip())
        return parse_markdown("\n\n".join(md_parts), doc_id)
    out = parse_markdown("\n\n".join(md_parts), doc_id)
    html_name = "__substg1.0_10130102"
    if html_name in cfb.entries:
        from .html_reader import parse_html

        try:
            rows = parse_html(cfb.stream(html_name).rstrip(b"\x00"), doc_id)
        except Exception:
            rows = []
        seq = len(out)
        for r in rows:
            r = dict(r)
            r["seq"] = seq
            seq += 1
            out.append(r)
    return out


def build_msg(subject: str, body: str = "", sender: str = "",
              to: str = "", html: Optional[bytes] = None) -> bytes:
    """Deterministic .msg fixture writer over the repo's OLE2 builder."""
    from .doc_legacy import _build_ole

    streams = {"__substg1.0_0037001F": subject.encode("utf-16-le")}
    if sender:
        streams["__substg1.0_0C1A001F"] = sender.encode("utf-16-le")
    if to:
        streams["__substg1.0_0E04001F"] = to.encode("utf-16-le")
    if body:
        streams["__substg1.0_1000001F"] = body.encode("utf-16-le")
    if html is not None:
        streams["__substg1.0_10130102"] = bytes(html)
    return _build_ole(streams)
