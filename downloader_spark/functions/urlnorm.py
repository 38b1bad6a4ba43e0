"""URL validation, SSRF predicate, and canonicalization.

Pure-Python row functions used inside the vectorized ``canonicalize_udf``
(see functions/udfs.py) AND by the single-node oracle — identical by
construction.

Reference semantics:
- ``validate_url``: /root/reference/src/downloader/validation.py:28-87
  (strip whitespace; prepend http:// when no scheme; reject file:// then
  non-http(s); require hostname matching ``^[a-zA-Z0-9._:-]+$``).
- SSRF checks, DNS-off deterministic mode: validation.py:90-268 (literal
  IPs checked by category in the reference's load-bearing order
  loopback → unspecified → cloud-metadata → link-local → multicast →
  reserved → private; domain hostnames checked against the regex
  blocklist validation.py:242-268).
- ``sanitize_user_agent``: validation.py:271-287.

The rebuild EXTENDS canonicalization (lowercase scheme+host, strip
default port, drop fragment, sort query params) — the reference does not
canonicalize beyond strip+default-scheme, so ``validate_url`` keeps its
minimal behavior for parity and ``canonicalize_url`` layers the rest.
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass
from urllib.parse import parse_qsl, urlencode, urlparse

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_HOSTNAME_RE = re.compile(r"^[a-zA-Z0-9._:-]+$")
_UA_SCRUB_RE = re.compile(r"[^\w\s\-\.\(\)/;:,]")

_LOCALHOST_NAMES = frozenset({"localhost", "localhost.localdomain", "ip6-localhost"})
_PRIVATE_HOST_PATTERNS = [
    re.compile(p)
    for p in (
        r"^127\.",
        r"^10\.",
        r"^172\.(1[6-9]|2[0-9]|3[01])\.",
        r"^192\.168\.",
        r"^169\.254\.",
        r"^0\.",
        r"^224\.",
    )
]

_DEFAULT_PORTS = {"http": 80, "https": 443}


@dataclass(frozen=True)
class UrlCheck:
    url: str  # sanitized url ("" when invalid)
    valid: bool
    reason: str  # "" when valid; stable reject-reason slug otherwise
    host: str  # hostname ("" when invalid)


def _classify_ip(ip_str: str) -> str:
    """Reject-reason for a literal IP, reference check order
    (validation.py:166-224); "" if the IP passes."""
    try:
        ip = ipaddress.ip_address(ip_str)
    except ValueError:
        return ""
    if ip.is_loopback:
        return "ssrf_loopback"
    if ip.is_unspecified:
        return "ssrf_unspecified"
    if ip_str in ("169.254.169.254", "fd00:ec2::254"):
        return "ssrf_cloud_metadata"
    if ip.is_link_local:
        return "ssrf_link_local"
    if ip.is_multicast:
        return "ssrf_multicast"
    if ip.is_reserved:
        return "ssrf_reserved"
    if ip.is_private:
        return "ssrf_private"
    return ""


def _hostname_blocked(hostname: str) -> bool:
    """DNS-off fallback blocklist (validation.py:229-268)."""
    if hostname.lower() in _LOCALHOST_NAMES:
        return True
    return any(p.match(hostname) for p in _PRIVATE_HOST_PATTERNS)


def validate_url(url: str | None) -> UrlCheck:
    """Reference-exact validate (validation.py:28-87), DNS-off mode.

    Returns a row instead of raising — errors become ``reject_reason``
    columns in the engine (P1+P2 of SURVEY §2.2).
    """
    if not url or not isinstance(url, str):
        return UrlCheck("", False, "empty_url", "")
    url = url.strip()
    if not url:
        return UrlCheck("", False, "empty_url", "")
    if not _SCHEME_RE.match(url):
        url = f"http://{url}"
    try:
        parsed = urlparse(url)
    except Exception:
        return UrlCheck("", False, "invalid_format", "")
    if parsed.scheme == "file":
        return UrlCheck("", False, "file_scheme", "")
    if parsed.scheme not in ("http", "https"):
        return UrlCheck("", False, "non_http_scheme", "")
    try:
        hostname = parsed.hostname
    except ValueError:
        return UrlCheck("", False, "bad_hostname", "")
    if not hostname:
        return UrlCheck("", False, "no_hostname", "")
    if not _HOSTNAME_RE.match(hostname):
        return UrlCheck("", False, "bad_hostname", "")

    # SSRF (deterministic DNS-off mode, validation.py:110-143)
    try:
        ipaddress.ip_address(hostname)
        is_ip = True
    except ValueError:
        is_ip = False
    if is_ip:
        reason = _classify_ip(hostname)
        if reason:
            return UrlCheck("", False, reason, "")
    elif _hostname_blocked(hostname):
        return UrlCheck("", False, "ssrf_hostname_blocked", "")

    return UrlCheck(url, True, "", hostname)


def canonicalize_url(url: str | None) -> UrlCheck:
    """Validate + rebuild canonicalization (frontier key).

    Extensions over the reference (documented in SURVEY §2.2 P1):
    lowercase scheme+host, strip default port, drop fragment, sort query
    parameters, collapse empty path to "/". Deterministic pure-string
    work — safe inside an Arrow UDF, no DNS.
    """
    check = validate_url(url)
    if not check.valid:
        return check
    parsed = urlparse(check.url)
    scheme = parsed.scheme.lower()
    host = (parsed.hostname or "").lower()
    try:
        port = parsed.port  # raises on out-of-range/non-numeric ports
    except ValueError:
        return UrlCheck("", False, "bad_port", "")
    # IPv6 literals must stay bracketed or the canonical form can never
    # be re-parsed (the ':' would read as a port separator)
    host_part = f"[{host}]" if ":" in host else host
    netloc = (
        host_part
        if (port is None or _DEFAULT_PORTS.get(scheme) == port)
        else f"{host_part}:{port}"
    )
    path = parsed.path or "/"
    query = ""
    if parsed.query:
        pairs = sorted(parse_qsl(parsed.query, keep_blank_values=True))
        query = urlencode(pairs)
    canonical = f"{scheme}://{netloc}{path}"
    if query:
        canonical += f"?{query}"
    return UrlCheck(canonical, True, "", host)


def sanitize_user_agent(user_agent: str | None = None) -> str:
    """Reference sanitize_user_agent (validation.py:271-287); the default
    UA string carries this engine's name instead of httpx's version."""
    if user_agent:
        return _UA_SCRUB_RE.sub("", user_agent)[:200]
    return "downloader-spark/0.1.0"
