"""RFC 822/2045 email reader: ``.eml`` → elements, attachments recursed.

Covers the ``message/rfc822`` entry of the extension→MIME family the
reference reaches through markitdown, with the stdlib ``email`` package
(``policy.default`` gives RFC 2047 header decoding and charset-correct
payload decoding for free — no third-party MIME code).

Document shape:

* ``# <Subject>`` header element (level 1);
* one ``**From:** … / **To:** … / **Date:** …`` paragraph for the
  envelope headers that exist;
* the best text body — ``text/plain`` preferred, else ``text/html``
  through the repo's HTML reader — parsed into normal elements;
* attachments recurse through the format dispatcher exactly like zip
  members (identifier ``outer.eml!filename``); unsupported or
  undecodable attachments are skipped — a mailbox is a container, one
  odd attachment must not kill the message.
"""

from __future__ import annotations

import email
import email.policy
from typing import List

from .markdown import parse_markdown


def _envelope_markdown(msg) -> str:
    lines = []
    for h in ("From", "To", "Cc", "Date"):
        v = msg.get(h)
        if v:
            lines.append(f"**{h}:** {v}")
    return "  \n".join(lines)


def parse_eml(data: bytes, doc_id: str) -> List[dict]:
    from .dispatch import parse_any  # local: dispatch imports this module

    msg = email.message_from_bytes(bytes(data), policy=email.policy.default)
    subject = str(msg.get("Subject", "")).strip() or "(no subject)"
    md_parts = [f"# {subject}"]
    env = _envelope_markdown(msg)
    if env:
        md_parts.append(env)

    body = msg.get_body(preferencelist=("plain",))
    html_body = None if body is not None else msg.get_body(
        preferencelist=("html",))
    if body is not None:
        try:
            md_parts.append(body.get_content().strip())
        except Exception:
            pass
    out = parse_markdown("\n\n".join(p for p in md_parts if p), doc_id)

    seq = len(out)

    def _append(rows: List[dict]) -> None:
        nonlocal seq
        for r in rows:
            r = dict(r)
            r["seq"] = seq
            seq += 1
            out.append(r)

    if html_body is not None:
        from .html_reader import parse_html

        try:
            _append(parse_html(html_body.get_content().encode("utf-8"),
                               doc_id))
        except Exception:
            pass
    for part in msg.iter_attachments():
        fname = part.get_filename()
        if not fname:
            continue
        try:
            payload = part.get_payload(decode=True)
            if payload:
                _append(parse_any(payload, f"{doc_id}!{fname}"))
        except Exception:
            continue
    return out
