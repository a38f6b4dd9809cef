"""URL canonicalization, registered-domain extraction, and per-domain
document caps — the crawl-side curation family every web-scale corpus
pipeline runs before any text operator sees a byte.

Why it belongs here: the reference's first act is normalizing raw input
into canonical comparable units (char-class filter + canonical k-mer
orientation, ``/root/reference/src/SkmerExtractor.cpp:59-90``) so that
equal content hashes equal. URLs are the web corpus's k-mers: the same
page arrives as ``HTTP://WWW.Site.COM:80/p?b=2&a=1&utm_source=feed#x``
and ``http://site.com/p?a=1&b=2`` — without canonical orientation,
URL-level dedup and per-domain budgeting silently fragment.

All three operators are engine-mirrorable by construction:

- **canonicalize_urls** is a ZERO-exchange narrow projection built from
  JVM string/array builtins (substring_index/split/filter/array_sort —
  whole-stage codegen, no Python). Canonical form: lowercase scheme and
  host, fragment dropped, default port dropped (http:80 / https:443),
  leading ``www.`` dropped, tracking params removed (``utm_*`` key
  prefix + fbclid/gclid/ref/mc_cid/mc_eid), surviving params sorted
  bytewise and re-joined. Each rule is a deterministic string rewrite —
  DuckDB replays them with split_part/list_filter/list_sort.
- **registered domain** uses last-two-labels with an inlined multi-part
  suffix allowlist (co.uk and friends). A production deployment swaps
  in the full Public Suffix List as a broadcast map-side lookup — same
  plan shape, bigger CASE table; the contract pins the algorithm, not
  the list.
- **per-domain caps** reuse :func:`sampling.group_sample_topk` (bottom-k
  by md5 hash order): deterministic, retry/partition-invariant, nested
  (a cap of 3 is a prefix of a cap of 5), ONE shuffle on domain, and
  hot-domain safe via the same ``prethin_cutoff`` map-side filter —
  exactly the "no more than N docs per domain" rule of C4/Gopher-style
  curation.

``synth_urls`` builds genuine messy URLs from a closed-form formula over
doc_id (md5-hex-digit decisions — the synth_real_media pattern), so the
DuckDB oracle rebuilds the SAME inputs independently and the whole
family is hash-exact end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "synth_urls",
    "canonicalize_urls",
    "domain_caps",
    "duckdb_synth_urls_sql",
    "duckdb_url_canonical_sql",
    "duckdb_domain_caps_sql",
]

# multi-part public suffixes the two-label rule must extend to three
TWO_LEVEL_SUFFIXES = ("co.uk", "org.uk", "co.jp", "com.au", "co.nz", "com.br")
# tracking params: key PREFIX utm_*, plus exact keys
TRACKING_KEYS = ("fbclid", "gclid", "ref", "mc_cid", "mc_eid")
TLDS = ("com", "org", "net", "co.uk", "com.au")


# --------------------------------------------------------------------------
# deterministic synthetic URLs (closed form over the id; both engines
# rebuild the same strings independently — no container bytes cross over)
# --------------------------------------------------------------------------

def _hexdigit(h: Column, i: int) -> Column:
    """i-th (1-based) hex char of an md5 string as 0..15."""
    return F.conv(F.substring(h, i, 1), 16, 10).cast("int")


def synth_urls(df: DataFrame, id_col: str = "doc_id",
               keep: tuple[str, ...] = ()) -> DataFrame:
    """(id, url[, *keep]) with deliberately messy-but-valid URLs:
    mixed-case scheme/host, optional www, default and non-default
    ports, tracking params in scrambled order, optional fragment.
    ``keep`` passes source columns through the projection, so consumers
    that need them (e.g. group_split's per-lang accounting) stay
    join-free.

    The md5 hex digits are materialized as ATTRIBUTES of a first
    projection stage (not reused ``Column`` trees): the url expression
    references digits ~30 times across its nested CASEs, and any
    downstream predicate Catalyst pushes to the scan substitutes the
    whole chain — with digits as leaf attributes the fully-inlined url
    stays a few KB instead of compounding (see canonicalize_urls)."""
    d = F.col(id_col)
    h = F.md5(F.concat(d.cast("string"), F.lit("url")))
    staged = df.select(
        "*", *[_hexdigit(h, i).alias(f"_d{i}") for i in range(1, 14)]
    )
    (d1, d2, d3, d4, d5, d6, d7, d8, d9, d10, d11, d12, d13) = [
        F.col(f"_d{i}") for i in range(1, 14)
    ]

    https = d1 % 2 == 1
    scheme = (
        F.when(https & (d2 % 4 == 0), F.lit("HTTPS"))
        .when(https, F.lit("https"))
        .when(d2 % 4 == 0, F.lit("HTTP"))
        .otherwise(F.lit("http"))
    )
    www = (
        F.when(d2 % 3 == 0, F.lit("WWW."))
        .when(d2 % 3 == 1, F.lit("www."))
        .otherwise(F.lit(""))
    )
    site = F.when(d3 % 4 == 0, F.lit("Site")).otherwise(F.lit("site"))
    n_site = (d3 * 16 + d4) % 64
    tld = F.lit(TLDS[0])
    for i, t in enumerate(TLDS[1:], start=1):
        tld = F.when(d5 % 5 == i, F.lit(t)).otherwise(tld)
    port = (
        F.when((d6 % 4 == 0) & https, F.lit(":443"))
        .when(d6 % 4 == 0, F.lit(":80"))
        .when(d6 % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/p"), (d7 % 8).cast("string"), F.lit("/page"), d8.cast("string")
    )
    p_id = F.concat(F.lit("id="), d.cast("string"))
    p_utm = F.when(d9 % 2 == 0, F.lit("utm_source=feed")).otherwise(F.lit(""))
    p_b = F.when(d10 % 2 == 0, F.lit("b=2")).otherwise(F.lit(""))
    p_fb = F.when(d11 % 2 == 0, F.lit("fbclid=x1")).otherwise(F.lit(""))
    parts = F.when(d12 % 2 == 0, F.array(p_b, p_id, p_utm, p_fb)).otherwise(
        F.array(p_id, p_utm, p_b, p_fb)
    )
    params = F.array_join(F.filter(parts, lambda x: x != ""), "&")
    frag = F.when(d13 % 2 == 0, F.lit("#sec")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), www, site, n_site.cast("string"), F.lit("."),
        tld, port, path, F.lit("?"), params, frag,
    )
    return staged.select(d.alias(id_col), url.alias("url"), *keep)


# --------------------------------------------------------------------------
# canonicalization (zero-exchange narrow projection)
# --------------------------------------------------------------------------

def _keep_param(x: Column) -> Column:
    key = F.substring_index(x, "=", 1)
    keep = (x != "") & ~key.startswith("utm_")
    for k in TRACKING_KEYS:
        keep = keep & (key != k)
    return keep


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``scheme``, ``host``, ``registered_domain``,
    ``canonical_url``. Pure codegen string surgery — plan-asserted
    exchange-free (tests/test_urls.py).

    Expression-size discipline (measured, not cosmetic). Two failure
    modes were hit and fixed here:

    1. A Python ``Column`` is an expression TREE, so reusing one
       (``hostport`` inside ``pathq`` inside ``path``…) copies the
       whole subtree into every use, and the
       ``substring(x, length(y)+1)`` idiom references its input TWICE —
       nested, the first draft was EXPONENTIAL in parse depth (~1 MB
       analyzed plan; optimizer + codegen time dwarfed the string work:
       warm ``domain_caps`` 9.6 s at sf0.1). Fix: every component is
       parsed from its parent with a SINGLE-reference
       ``regexp_extract``/``substring_index`` (the registered domain is
       ONE anchored regexp over ``host``, not split/element_at chains),
       so even the fully-inlined form — which Catalyst is always
       entitled to build via CollapseProject/pushdown substitution —
       stays LINEAR in parse depth.
    2. The tempting alternative, a CHAIN of projections whose
       intermediates become attributes, plans beautifully in isolation
       but made the optimizer itself blow up downstream: constraint
       propagation closes predicates over every alias level, and under
       ``domain_caps``'s filter + window that closure OOMed the driver
       at 500 input rows. Hence ONE projection: single-level alias
       substitution, linear trees — small plans under every consumer.

    Canonical form: lowercase scheme and host, fragment dropped,
    default port dropped, leading ``www.`` dropped, tracking params
    removed, surviving params sorted bytewise. The registered-domain
    regexp's leftmost-match-reaching-``$`` is exactly "last two labels,
    or three when the last two are a listed multi-part suffix, or the
    host itself when dot-free"."""
    u = F.col(url_col)
    work = F.substring_index(u, "#", 1)
    scheme = F.lower(F.regexp_extract(work, r"^([^:/?#]*)://", 1))
    hostport = F.lower(F.regexp_extract(work, r"^[^:/?#]*://([^/?#]*)", 1))
    pathq = F.regexp_extract(work, r"^[^:/?#]*://[^/?#]*(.*)$", 1)
    path = F.when(pathq == "", F.lit("/")).otherwise(
        F.substring_index(pathq, "?", 1)
    )
    query = F.regexp_extract(pathq, r"[?](.*)$", 1)
    host_full = F.substring_index(hostport, ":", 1)
    port = F.regexp_extract(hostport, r":([0-9]*)$", 1)
    host = F.when(
        host_full.startswith("www."),
        F.substring(host_full, 5, F.lit(1 << 30)),
    ).otherwise(host_full)
    portpart = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    params = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), _keep_param)), "&"
    )
    suffix_alt = "|".join(sfx.replace(".", r"\.") for sfx in TWO_LEVEL_SUFFIXES)
    domain_re = rf"([^.]+\.(?:{suffix_alt})|[^.]+\.[^.]+|^[^.]+)$"
    domain = F.regexp_extract(host, domain_re, 1)
    canonical = F.concat(
        scheme, F.lit("://"), host, portpart, path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        domain.alias("registered_domain"),
        canonical.alias("canonical_url"),
    )


def domain_caps(df: DataFrame, cap: int, domain_col: str = "registered_domain",
                id_col: str = "doc_id", seed: str = "cap",
                blocklist_prefixes: tuple[str, ...] = (),
                prethin_cutoff: int | None = None) -> DataFrame:
    """Per-domain accounting of the cap rule: blocklisted domains are
    dropped wholesale (broadcast-free literal prefix filter — a real
    deployment swaps in a broadcast anti-join against a blocklist
    table), then at most ``cap`` docs survive per domain, chosen by the
    deterministic md5 bottom-k order of group_sample_topk. Returns
    (registered_domain, n_docs, n_kept, min_kept_doc, max_kept_doc).

    The filtered (domain, id) projection is PERSISTED before fan-out —
    deliberately, and not only because two consumers (sampler + totals)
    read it. Catalyst's constraint propagation closes the blocklist
    predicate over the url→host→domain derivation chain on BOTH
    branches and through the window; with ``canonicalize_urls``'s
    expression trees that closure alone cost ~38 s per execution at
    500 input rows (driver-side, re-paid on every action) and OOMed a
    1 GiB driver. The cache is an optimizer barrier: downstream plans
    see a leaf relation, optimize in milliseconds (measured 38 s →
    0.5 s), and at 100 TB persisting two narrow columns before a
    multi-consumer fan-out is the shape you want anyway."""
    from .sampling import group_sample_topk

    for p in blocklist_prefixes:
        df = df.where(~F.col(domain_col).startswith(p))
    base = df.select(domain_col, id_col).persist()
    kept = group_sample_topk(
        base, key=id_col, group=domain_col, n=cap, seed=seed,
        prethin_cutoff=prethin_cutoff,
    )
    totals = base.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    kept_agg = kept.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.min(id_col).cast("long").alias("min_kept_doc"),
        F.max(id_col).cast("long").alias("max_kept_doc"),
    )
    return totals.join(kept_agg, domain_col)


# --------------------------------------------------------------------------
# DuckDB mirrors
# --------------------------------------------------------------------------

def duckdb_synth_urls_sql(table: str, id_col: str = "doc_id") -> str:
    """Rebuilds synth_urls' strings independently (same md5 hex-digit
    decisions — `('0x' || char)::BIGINT` is the single-digit conv)."""
    tld_case = "CASE d5 % 5 " + " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(TLDS)
    ) + " END"
    return f"""
      SELECT {id_col}, scheme || '://' || www || site || CAST(n_site AS VARCHAR)
             || '.' || {tld_case} || port || path || '?' ||
             array_to_string(list_filter(parts, x -> x <> ''), '&') || frag AS url
      FROM (
        SELECT {id_col}, d5,
          CASE WHEN d1 % 2 = 1 AND d2 % 4 = 0 THEN 'HTTPS'
               WHEN d1 % 2 = 1 THEN 'https'
               WHEN d2 % 4 = 0 THEN 'HTTP' ELSE 'http' END AS scheme,
          CASE WHEN d2 % 3 = 0 THEN 'WWW.' WHEN d2 % 3 = 1 THEN 'www.'
               ELSE '' END AS www,
          CASE WHEN d3 % 4 = 0 THEN 'Site' ELSE 'site' END AS site,
          (d3 * 16 + d4) % 64 AS n_site,
          CASE WHEN d6 % 4 = 0 AND d1 % 2 = 1 THEN ':443'
               WHEN d6 % 4 = 0 THEN ':80'
               WHEN d6 % 4 = 1 THEN ':8080' ELSE '' END AS port,
          '/p' || CAST(d7 % 8 AS VARCHAR) || '/page' || CAST(d8 AS VARCHAR) AS path,
          CASE WHEN d12 % 2 = 0
               THEN [p_b, p_id, p_utm, p_fb]
               ELSE [p_id, p_utm, p_b, p_fb] END AS parts,
          CASE WHEN d13 % 2 = 0 THEN '#sec' ELSE '' END AS frag
        FROM (
          SELECT {id_col},
            ('0x' || substr(h,1,1))::BIGINT AS d1, ('0x' || substr(h,2,1))::BIGINT AS d2,
            ('0x' || substr(h,3,1))::BIGINT AS d3, ('0x' || substr(h,4,1))::BIGINT AS d4,
            ('0x' || substr(h,5,1))::BIGINT AS d5, ('0x' || substr(h,6,1))::BIGINT AS d6,
            ('0x' || substr(h,7,1))::BIGINT AS d7, ('0x' || substr(h,8,1))::BIGINT AS d8,
            ('0x' || substr(h,9,1))::BIGINT AS d9, ('0x' || substr(h,10,1))::BIGINT AS d10,
            ('0x' || substr(h,11,1))::BIGINT AS d11, ('0x' || substr(h,12,1))::BIGINT AS d12,
            ('0x' || substr(h,13,1))::BIGINT AS d13,
            'id=' || CAST({id_col} AS VARCHAR) AS p_id
          FROM (SELECT {id_col}, md5(CAST({id_col} AS VARCHAR) || 'url') AS h
                FROM {table})
        ) d
        CROSS JOIN LATERAL (SELECT
            CASE WHEN d9  % 2 = 0 THEN 'utm_source=feed' ELSE '' END AS p_utm,
            CASE WHEN d10 % 2 = 0 THEN 'b=2' ELSE '' END AS p_b,
            CASE WHEN d11 % 2 = 0 THEN 'fbclid=x1' ELSE '' END AS p_fb) e
      ) s
    """


def _duckdb_canonical_exprs() -> str:
    """Shared canonicalization CTE body: url -> scheme/host/
    registered_domain/canonical_url (mirrors canonicalize_urls rule for
    rule)."""
    keys = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    sfx = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""
      parsed AS (
        SELECT *,
          lower(split_part(work, '://', 1)) AS scheme,
          substr(work, length(split_part(work, '://', 1)) + 4) AS rest
        FROM (SELECT *, split_part(url, '#', 1) AS work FROM urls)
      ),
      hostsplit AS (
        SELECT *,
          lower(split_part(rest, '/', 1)) AS hostport,
          substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
        FROM parsed
      ),
      pieces AS (
        SELECT *,
          split_part(hostport, ':', 1) AS host_full,
          CASE WHEN contains(hostport, ':')
               THEN substr(hostport, length(split_part(hostport, ':', 1)) + 2)
               ELSE '' END AS port,
          CASE WHEN pathq = '' THEN '/' ELSE split_part(pathq, '?', 1) END AS path,
          CASE WHEN contains(pathq, '?')
               THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
               ELSE '' END AS query
        FROM hostsplit
      ),
      canon AS (
        SELECT *, scheme || '://' || host || portpart || path ||
               CASE WHEN params = '' THEN '' ELSE '?' || params END AS canonical_url,
               string_split(host, '.') AS labels
        FROM (
          SELECT *,
            CASE WHEN starts_with(host_full, 'www.')
                 THEN substr(host_full, 5) ELSE host_full END AS host,
            CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END AS portpart,
            array_to_string(list_sort(list_filter(string_split(query, '&'),
              x -> x <> '' AND NOT starts_with(split_part(x, '=', 1), 'utm_')
                   AND split_part(x, '=', 1) NOT IN ({keys}))), '&') AS params
          FROM pieces)
      ),
      canonical AS (
        SELECT *, CASE
            WHEN len(labels) <= 2 THEN host
            WHEN len(labels) >= 3
                 AND labels[-2] || '.' || labels[-1] IN ({sfx})
            THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
            ELSE labels[-2] || '.' || labels[-1] END AS registered_domain
        FROM canon
      )
    """


def duckdb_url_canonical_sql(table: str, id_col: str = "doc_id") -> str:
    """Per-registered-domain canonicalization accounting (mirror of the
    url_canonical contract query)."""
    return f"""
      WITH urls AS ({duckdb_synth_urls_sql(table, id_col)}),
      {_duckdb_canonical_exprs()}
      SELECT registered_domain,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
             CAST(SUM(CASE WHEN contains(url, 'utm_') OR contains(url, 'fbclid=')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_tracking,
             MIN(canonical_url) AS sample_url
      FROM canonical
      GROUP BY registered_domain
    """


def duckdb_domain_caps_sql(table: str, cap: int, id_col: str = "doc_id",
                           seed: str = "cap",
                           blocklist_prefixes: tuple[str, ...] = ()) -> str:
    """Mirror of the domain_caps contract query: same blocklist prefix
    filter, same md5 bottom-k order as duckdb_group_sample_sql."""
    block = " AND ".join(
        f"NOT starts_with(registered_domain, '{p}')" for p in blocklist_prefixes
    ) or "TRUE"
    h = f"('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '{seed}'), 1, 8))::BIGINT"
    return f"""
      WITH urls AS ({duckdb_synth_urls_sql(table, id_col)}),
      {_duckdb_canonical_exprs()},
      survivors AS (
        SELECT {id_col}, registered_domain FROM canonical WHERE {block}
      ),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY registered_domain ORDER BY {h}, {id_col}) AS rk
        FROM survivors
      )
      SELECT registered_domain,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN rk <= {cap} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(MIN(CASE WHEN rk <= {cap} THEN {id_col} END) AS BIGINT) AS min_kept_doc,
             CAST(MAX(CASE WHEN rk <= {cap} THEN {id_col} END) AS BIGINT) AS max_kept_doc
      FROM ranked
      GROUP BY registered_domain
    """
