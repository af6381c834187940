"""Registrable-domain extraction per the Public Suffix List algorithm.

The algorithm is the published one from publicsuffix.org/list/ (public
spec):

* a rule matches a host when the rule's labels are a suffix of the
  host's labels; ``*`` matches exactly one label at its position;
* if any EXCEPTION rule (``!`` prefix) matches, it prevails and the
  public suffix is that rule minus its leftmost label;
* otherwise the prevailing rule is the matching rule with the MOST
  labels; when nothing matches, the implicit default rule ``*`` makes
  the bare TLD the public suffix;
* the registrable domain is the public suffix plus one preceding label
  (absent when the host IS a public suffix).

``PSL_RULES`` is a VENDORED SNAPSHOT SUBSET of the list (the sandbox
has no network; the real list is ~9k rules and drops into this same
variable — every code path below is data-driven from it). The subset
covers the rule SHAPES the algorithm must handle: multi-label suffixes
(``co.uk``), 3-label suffixes (``s3.amazonaws.com``), wildcards
(``*.ck``), exceptions (``!www.ck``), and private-section operator
suffixes (``github.io``).

Both engines evaluate the SAME generated rule predicates — the Spark
Column expression and the DuckDB SQL text are produced from the one
rule table below, so the gate's cross-engine compare exercises a single
source of truth. Everything is per-row string/array algebra inside
whole-stage codegen: no UDF, no join, no shuffle (the rule set compiles
into IN-set predicates, the expression analog of broadcasting a tiny
dim table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: vendored snapshot subset (see module docstring). ``!`` = exception,
#: ``*.`` = wildcard, otherwise a literal public suffix.
PSL_RULES = [
    # ICANN section: United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp",
    # Brazil / China / India / Korea / South Africa / Mexico
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "co.za", "net.za", "org.za", "web.za",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    # assorted ccSLDs
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.nz", "net.nz", "org.nz",
    # wildcard TLDs: every 2-label suffix under them is public
    "*.ck", "*.er", "*.np",
    # exception: www.ck is registrable even though *.ck matches
    "!www.ck",
    # private section: operator suffixes
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com", "pages.dev",
]


def _classify():
    exc, norm, wild = {}, {}, {}
    for rule in PSL_RULES:
        if rule.startswith("!"):
            body = rule[1:]
            exc.setdefault(body.count(".") + 1, []).append(body)
        elif rule.startswith("*."):
            wild.setdefault(rule.count(".") + 1, []).append(rule)
        else:
            norm.setdefault(rule.count(".") + 1, []).append(rule)
    return exc, norm, wild


_EXC, _NORM, _WILD = _classify()
_MAX_K = max(list(_EXC) + list(_NORM) + list(_WILD))


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a lowercase ``host`` column ('' when the
    host is itself a public suffix, keeping the column non-null for the
    fetch-stable gate)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def sfx(k):
        return F.concat_ws(".", F.slice(labels, -k, k))

    # prevailing-rule label count of the PUBLIC SUFFIX: exceptions
    # first (any match prevails; suffix = rule minus leftmost label),
    # then literal/wildcard rules longest-first, default 1 (rule '*')
    ps = None
    for k in sorted(_EXC, reverse=True):
        cond = (n >= k) & sfx(k).isin(_EXC[k])
        ps = F.when(cond, k - 1) if ps is None else ps.when(cond, k - 1)
    for k in range(_MAX_K, 1, -1):
        cond = F.lit(False)
        if k in _NORM:
            cond = cond | sfx(k).isin(_NORM[k])
        if k in _WILD:
            cond = cond | F.concat(F.lit("*."), sfx(k - 1)).isin(_WILD[k])
        cond = (n >= k) & cond
        ps = F.when(cond, k) if ps is None else ps.when(cond, k)
    ps = ps.otherwise(1)

    return F.when(n > ps,
                  F.concat_ws(".", F.slice(labels, -(ps + F.lit(1)),
                                           ps + F.lit(1)))) \
            .otherwise(F.lit(""))


def _sql_in(vals):
    return "(" + ", ".join("'%s'" % v for v in vals) + ")"


def registrable_domain_sql(labs: str = "labs") -> str:
    """DuckDB scalar expression over a pre-split label list column
    ``labs`` (``string_split(host, '.')``) — the same generated rule
    predicates as the Spark expression, single source of truth."""

    def sfx(k):
        return ("array_to_string(%s[greatest(len(%s)-%d+1,1):len(%s)],"
                " '.')" % (labs, labs, k, labs))

    whens = []
    for k in sorted(_EXC, reverse=True):
        whens.append("WHEN len(%s) >= %d AND %s IN %s THEN %d"
                     % (labs, k, sfx(k), _sql_in(_EXC[k]), k - 1))
    for k in range(_MAX_K, 1, -1):
        ors = []
        if k in _NORM:
            ors.append("%s IN %s" % (sfx(k), _sql_in(_NORM[k])))
        if k in _WILD:
            ors.append("'*.' || %s IN %s" % (sfx(k - 1), _sql_in(_WILD[k])))
        whens.append("WHEN len(%s) >= %d AND (%s) THEN %d"
                     % (labs, k, " OR ".join(ors), k))
    ps = "(CASE %s ELSE 1 END)" % " ".join(whens)
    return ("CASE WHEN len({labs}) > {ps} THEN array_to_string("
            "{labs}[len({labs})-{ps}:len({labs})], '.') ELSE '' END"
            .format(labs=labs, ps=ps))
