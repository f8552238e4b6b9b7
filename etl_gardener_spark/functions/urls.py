"""URL canonicalization as pure Catalyst expressions, with DuckDB
mirrors — the standard first pass on web corpora before any dedup
(C4/RefinedWeb/CCNet all key cross-snapshot dedup on a normalized URL,
and host-level caps need a normalized host).

Rules, in application order (each is a pure column expression — no
UDF, no shuffle; applies map-side at any corpus size):

1. split ``scheme://authority/rest`` with anchored ``regexp_extract``;
   a value with no ``scheme://`` prefix passes through trimmed and
   otherwise untouched (not a URL — don't guess);
2. scheme -> lowercase;
3. authority: strip ``user:pass@`` userinfo, lowercase, strip the
   scheme's DEFAULT port (``:80`` http, ``:443`` https, ``:21`` ftp —
   non-default ports are meaningful and kept), strip one leading
   ``www.`` label;
4. rest: fragment dropped (never sent to the server), tracking
   parameters removed (the ``TRACKING_PARAMS`` registry: utm_*,
   click-ids, share-ids — the value-less analytics decoration that
   makes one page look like many), separator runs re-normalized
   (``?&`` / ``&&`` / trailing ``?``), trailing path slashes dropped
   (root collapses to the bare authority).

NOT done, deliberately: percent-decoding (changes semantics for
reserved characters), query-param re-sorting (order can be meaningful
and sorting without decoding is unsound), duplicate-slash collapse
inside the path (semantic on some servers). A canonicalizer for dedup
must only merge names that are BYTE-EQUIVALENT requests.

Pattern portability: same contract as functions/scrub.py — only syntax
with identical semantics in Java regex (Spark) and RE2 (DuckDB):
character classes, greedy quantifiers, alternation (longest alternative
listed first), capture groups in the PATTERN. The REPLACEMENT dialect
differs (``$1`` vs ``\\1``), which is why every step is rendered twice
from the same shared constants below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: analytics / click-tracking query parameters stripped by
#: canonical_url. Longest-prefix alternatives first (ref_src before
#: ref) so leftmost-first alternation picks the full name.
TRACKING_PARAMS: tuple[str, ...] = (
    r"utm_[a-z0-9_]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref_src",
    "ref",
)

#: scheme -> default port, stripped from the authority when explicit.
DEFAULT_PORTS: dict[str, str] = {"http": "80", "https": "443", "ftp": "21"}

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
#: everything after the authority, fragment excluded (stop at '#')
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"
_USERINFO_RE = r"^[^@]*@"
_WWW_RE = r"^www\."
#: separator + tracking param + value (value stops at '&'; '#' is gone
#: by extraction). Group 1 keeps the separator for reinsertion.
_TRACKING_RE = "([?&])(" + "|".join(TRACKING_PARAMS) + ")=[^&]*"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _canon_scheme(u: Column) -> Column:
    return F.lower(F.regexp_extract(u, _SCHEME_RE, 1))


def _canon_host(u: Column, scheme: Column, keep_port: bool) -> Column:
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    auth = F.lower(F.regexp_replace(auth, _USERINFO_RE, ""))
    if keep_port:
        port = auth  # start the CASE chain from the lowercased value
        for sch, p in DEFAULT_PORTS.items():
            port = F.when(
                scheme == sch, F.regexp_replace(auth, f":{p}$", "")
            ).otherwise(port)
        auth = port
    else:
        auth = F.regexp_replace(auth, r":[0-9]+$", "")
    return F.regexp_replace(auth, _WWW_RE, "")


def _canon_rest(u: Column) -> Column:
    rest = F.regexp_extract(u, _REST_RE, 1)
    rest = F.regexp_replace(rest, _TRACKING_RE, "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+\?", "?")
    return F.regexp_replace(rest, r"/+$", "")


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column (rules in the module docstring).
    Non-URL values (no ``scheme://``) pass through trimmed."""
    u = F.trim(_c(col))
    scheme = _canon_scheme(u)
    canon = F.concat(
        scheme, F.lit("://"), _canon_host(u, scheme, keep_port=True), _canon_rest(u)
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_host(col: Column | str) -> Column:
    """Canonical HOST of a URL column — lowercased, userinfo and ANY
    port stripped (host-level grouping ignores ports), one leading
    ``www.`` label stripped. Non-URL values yield ''."""
    u = F.trim(_c(col))
    return _canon_host(u, _canon_scheme(u), keep_port=False)


# -- DuckDB mirrors ---------------------------------------------------------
# Rendered from the SAME pattern constants; only the replacement
# backreference dialect ('\\1' vs '$1') and the explicit 'g' flag differ.


def _sq(pat: str) -> str:
    return pat.replace("'", "''")


def _host_sql(expr: str, scheme_sql: str, keep_port: bool) -> str:
    auth = f"lower(regexp_replace(regexp_extract({expr}, '{_sq(_AUTH_RE)}', 1), '{_sq(_USERINFO_RE)}', '', 'g'))"
    if keep_port:
        arms = " ".join(
            f"WHEN {scheme_sql} = '{sch}' THEN regexp_replace({auth}, ':{p}$', '', 'g')"
            for sch, p in DEFAULT_PORTS.items()
        )
        auth = f"(CASE {arms} ELSE {auth} END)"
    else:
        auth = f"regexp_replace({auth}, ':[0-9]+$', '', 'g')"
    return f"regexp_replace({auth}, '{_sq(_WWW_RE)}', '', 'g')"


def _rest_sql(expr: str) -> str:
    out = f"regexp_extract({expr}, '{_sq(_REST_RE)}', 1)"
    for pat, rep in (
        (_TRACKING_RE, r"\1"),
        (r"&&+", "&"),
        (r"\?&", "?"),
        (r"[?&]+$", ""),
        (r"/+\?", "?"),
        (r"/+$", ""),
    ):
        out = f"regexp_replace({out}, '{_sq(pat)}', '{rep}', 'g')"
    return out


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url` over a SQL expression."""
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '{_sq(_SCHEME_RE)}', 1))"
    canon = f"({scheme} || '://' || {_host_sql(u, scheme, True)} || {_rest_sql(u)})"
    return f"(CASE WHEN {scheme} = '' THEN {u} ELSE {canon} END)"


def url_host_sql(expr: str) -> str:
    """DuckDB mirror of :func:`url_host`."""
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '{_sq(_SCHEME_RE)}', 1))"
    return _host_sql(u, scheme, False)
