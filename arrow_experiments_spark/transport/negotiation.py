"""HTTP content negotiation for Arrow-over-HTTP egress.

Behavior contract (re-expressed from the reference's documented semantics,
NOT a code port):
  * header grammar — RFC 2616 token / quoted-string / comma / semicolon
    lists (reference doc: http/get_compressed/python/server/server.py:114-178
    describes the same grammar);
  * IPC codec choice via ``Accept: application/vnd.apache.arrow.stream;
    codecs="zstd, lz4"`` with media-range wildcards ``*/*`` and
    ``application/*``, explicit empty codecs ⇒ no compression
    (http/get_compressed/README.md:63-104);
  * content-coding choice via Accept-Encoding q-values: ``*`` wildcard,
    identity-always-acceptable-unless-q=0, server preference order among
    max-q candidates, nothing acceptable ⇒ 406
    (http/get_compressed/README.md:106-176);
  * strategy merge: an explicitly requested IPC codec wins over HTTP
    coding; never both (the don't-double-compress rule,
    http/get_compressed/README.md:35-40).

Strategy strings match the reference's vocabulary: ``"identity"``,
``"identity+zstd"``, ``"identity+lz4"`` (IPC buffer compression), or a
content-coding like ``"gzip"``/``"br"``/``"zstd"`` (HTTP body compression).
"""

from __future__ import annotations

import re

ARROW_STREAM_CONTENT_TYPE = "application/vnd.apache.arrow.stream"

# RFC 2616: token chars = printable ASCII minus separators/CTLs.
_TOKEN = r"[A-Za-z0-9!#$%&'*+.^_`|~/-]+"
_SCANNER = re.compile(
    rf"(?P<tok>{_TOKEN})"
    r'|(?P<quoted>"(?:[^"\\]|\\.)*")'
    r"|(?P<sep>[,;=])"
    r"|(?P<ws>[ \t]+|\r\n[ \t]+)"
    r"|(?P<bad>.)",
    re.ASCII,
)


class NotAcceptable(ValueError):
    """Raised for malformed negotiation headers (maps to HTTP 406)."""


def _scan(header_name: str, value: str):
    for m in _SCANNER.finditer(value):
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "bad":
            raise NotAcceptable(
                f"Malformed {header_name} header: unexpected character {m.group()!r}"
            )
        yield kind, m.group()


def parse_list_header(header_name: str, value: str) -> list[tuple[str, dict[str, str | None]]]:
    """Parse ``item;p1=v1;p2, item2;q=0.5`` into ``[(item, params), ...]``.

    Items are lowercased; a parameter without ``=value`` maps to ``None``;
    quoted parameter values are unquoted.  Trailing separators and
    half-finished parameter clauses are tolerated, mirroring the lenient
    behavior the reference documents.
    """
    out: list[tuple[str, dict[str, str | None]]] = []
    item: str | None = None
    params: dict[str, str | None] = {}
    pending_param: str | None = None
    expect = "item"  # item | after-item | param-name | param-eq-or-next | param-value

    for kind, text in _scan(header_name, value):
        if expect == "item":
            if kind != "tok":
                raise NotAcceptable(f"Malformed {header_name} header: expected item, got {text!r}")
            item, params = text.lower(), {}
            expect = "after-item"
        elif expect == "after-item":
            if text == ",":
                out.append((item, params))
                item = None
                expect = "item"
            elif text == ";":
                expect = "param-name"
            else:
                raise NotAcceptable(f"Malformed {header_name} header: unexpected {text!r}")
        elif expect == "param-name":
            if kind != "tok":
                raise NotAcceptable(
                    f"Malformed {header_name} header: expected parameter name, got {text!r}"
                )
            pending_param = text
            params[pending_param] = None
            expect = "param-eq-or-next"
        elif expect == "param-eq-or-next":
            if text == "=":
                expect = "param-value"
            elif text == ";":
                expect = "param-name"
            elif text == ",":
                out.append((item, params))
                item = None
                expect = "item"
            else:
                raise NotAcceptable(f"Malformed {header_name} header: unexpected {text!r}")
        elif expect == "param-value":
            if kind == "quoted":
                params[pending_param] = text[1:-1]
            elif kind == "tok":
                params[pending_param] = text
            else:
                raise NotAcceptable(
                    f"Malformed {header_name} header: expected parameter value, got {text!r}"
                )
            expect = "after-item"

    if item is not None:
        out.append((item, params))
    return out


_ARROW_MEDIA_RANGES = {"*/*", "application/*", ARROW_STREAM_CONTENT_TYPE}


def choose_ipc_codec(
    accept_header: str | None, available: list[str], default: str | None
) -> str | None:
    """Resolve the IPC buffer-compression codec from the Accept header.

    Returns the first server-preferred codec the client listed; ``default``
    when the client never used a ``codecs`` parameter; ``None`` when the
    client used ``codecs`` but nothing acceptable remains (including the
    explicit ``codecs=""`` opt-out).
    """
    saw_codecs_param = False
    client_codecs: list[str] = []
    if accept_header is not None:
        for media_range, params in parse_list_header("Accept", accept_header):
            if media_range not in _ARROW_MEDIA_RANGES:
                continue
            if "codecs" in params:
                saw_codecs_param = True
            raw = params.get("codecs")
            if raw:
                client_codecs.extend(c.strip() for c in raw.split(","))
    for codec in available:
        if codec in client_codecs:
            return codec
    return None if saw_codecs_param else default


_IDENTITY_DEFAULT_Q = 0.0001  # non-zero so identity loses ties but stays acceptable


def choose_content_coding(accept_encoding: str, available: list[str]) -> str | None:
    """Resolve the HTTP content-coding from Accept-Encoding q-values.

    ``*`` fills in every remaining available coding; identity is always
    acceptable unless explicitly refused with q=0; among the max-q
    candidates the server's preference order decides; ``None`` ⇒ 406.
    """
    candidates = list(available)
    if "identity" not in candidates:
        candidates.append("identity")

    q: dict[str, float] = {}
    for coding, params in parse_list_header("Accept-Encoding", accept_encoding):
        raw_q = params.get("q")
        if raw_q is None:
            qv = _IDENTITY_DEFAULT_Q if coding == "identity" else 1.0
        else:
            try:
                qv = float(raw_q)
            except ValueError as e:
                raise NotAcceptable(f"Invalid qvalue in Accept-Encoding header: {raw_q}") from e
        if coding == "*":
            for c in candidates:
                q.setdefault(c, qv)
        elif coding in candidates:
            q[coding] = qv
    q.setdefault("identity", _IDENTITY_DEFAULT_Q)

    best = max(q.values())
    if best == 0.0:
        return None
    for coding in candidates:
        if q.get(coding) == best:
            return coding
    return None


def choose_strategy(
    headers,
    available_ipc_codecs: list[str],
    available_codings: list[str],
    default: str,
) -> str | None:
    """Merge the two mechanisms: IPC codec wins when requested; otherwise
    Accept-Encoding decides; otherwise the protocol-version default."""
    ipc = choose_ipc_codec(headers.get("Accept"), available_ipc_codecs, default=None)
    if ipc is not None:
        return f"identity+{ipc}"
    accept_encoding = headers.get("Accept-Encoding")
    if accept_encoding is None:
        return default
    return choose_content_coding(accept_encoding, available_codings)
