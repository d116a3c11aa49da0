"""Incremental materialized-view refresh.

The reference registers empty ``__delta__`` placeholder tables "for future
incremental refresh" and always recomputes from scratch
(datafusion_iceberg/src/materialized_view.rs:147-159; README.md:22-46 lists
incremental refresh as unimplemented). This module implements it:

* classify the view SQL into an incrementally-maintainable shape,
* read only the rows appended to the source since the last refresh
  (snapshot-range incremental scan, the reference's table/mod.rs:120-144
  mechanism — the one piece of delta machinery it does have),
* fold the delta into the storage table: APPEND for select-project-filter
  views, partial-aggregate MERGE for single-table GROUP BY views.

Soundness gate: incremental maintenance is only valid when every source
commit since the last refresh was an append. Any overwrite (compaction is
fine — but delete/merge/rewrite change visible rows) forces a full refresh;
``appends_only_since`` checks the snapshot log's operation summaries.

At 100 TB this is the difference between re-scanning the fact table and
scanning a day's partition: refresh cost tracks delta size, not table size.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# aggregate → how two partial values merge under an append-only delta
_MERGEABLE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

_SHAPE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<rel>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
    r"(?:\s+HAVING\s+(?P<having>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_RE = re.compile(
    # greedy arg up to the LAST ')': allows nested calls like
    # SUM(CAST(x AS DECIMAL(38,10))) — exact-decimal partials merge exactly
    r"^\s*(?P<fn>sum|count|min|max)\s*\((?P<arg>.*)\)\s+AS\s+(?P<alias>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# HAVING left out (r13): the affected-group recompute path evaluates it
# naturally — a group failing HAVING is eq-deleted and not re-appended;
# the SPJ/lineage paths and the partial-merge path still reject it
_FORBIDDEN_RE = re.compile(
    r"\b(join|union|intersect|except|distinct|over|limit|order\s+by)\b|\(\s*select\b",
    re.IGNORECASE,
)
# join views: the same exclusions minus the single inner JOIN itself
_FORBIDDEN_NONJOIN_RE = re.compile(
    r"\b(union|intersect|except|distinct|over|limit|order\s+by|having|group\s+by"
    r"|left|right|full|cross|outer|semi|anti)\b|\(\s*select\b",
    re.IGNORECASE,
)
# join+aggregate views (r12): the join exclusions minus GROUP BY itself
# (and minus HAVING since r13 — affected-group recompute evaluates it)
_FORBIDDEN_JOINAGG_RE = re.compile(
    r"\b(union|intersect|except|distinct|over|limit|order\s+by"
    r"|left|right|full|cross|outer|semi|anti)\b|\(\s*select\b",
    re.IGNORECASE,
)
_AGG_CALL_RE = re.compile(r"\b(sum|count|min|max|avg|stddev|var\w*)\s*\(", re.IGNORECASE)
_JOIN_SHAPE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+"
    r"(?P<rel_a>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!JOIN\b|INNER\b)(?P<alias_a>[A-Za-z_]\w*))?"
    r"\s+(?:INNER\s+)?JOIN\s+"
    r"(?P<rel_b>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!ON\b)(?P<alias_b>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<cond>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass(frozen=True)
class IncrementalPlan:
    mode: str  # "append" | "aggregate" | "join" | "join_agg" | "joinN" | "joinN_agg"
    relation: str
    group_keys: tuple = ()
    merge_ops: dict = field(default_factory=dict)  # output column -> sum|min|max
    relation_b: str | None = None  # second source of a "join" view
    relation_c: str | None = None  # third source of an n-relation view
    # join_agg (r12): the SPJ projection of the group keys over the same
    # FROM/ON/WHERE — run over the delta arms to find the affected groups
    probe_sql: str | None = None
    # join_agg: (col on rel_a, col on rel_b) pairs from the ON condition's
    # AND-conjoined equalities (pre-parsed — join_equi_keys can't re-derive
    # them from the full SQL once a GROUP BY tail is present)
    equi_keys: tuple = ()
    # join_agg: per group key, the source column to push the affected-set
    # filter into: ("a"|"b", column) or None when the key's side is unknown
    # (joinN_agg: (slot index, column) or None)
    key_sources: tuple = ()
    # joinN (r13): ALL relations of an n-relation join chain, in join
    # order — slot i's delta arm stages slots j<i at OLD, j>i at NEW
    relations: tuple = ()


# hidden MV-storage column carrying the SOURCE row's v3 _row_id for
# single-table SPJ views: changelog delete maintenance becomes an anti-join
# on one long key (AQE-broadcastable) instead of a full-width multiset
# exceptAll over the whole storage — the difference between shuffling every
# stored column and shipping a changelog-sized id list at 100 TB.
SRC_ROW_ID = "__sg_src_row_id"


def lineage_sql(sql: str) -> str | None:
    """For a single-table SPJ view: the same SQL with the source ``_row_id``
    carried through as the hidden storage column. None when the shape
    doesn't allow it (aggregates, joins, SELECT * — which would already
    expand the lineage columns of the instrumented source view)."""
    m = _SHAPE_RE.match(sql.strip())
    if not m or _FORBIDDEN_RE.search(sql) or m.group("group") or m.group("having"):
        return None
    if "*" in m.group("select"):
        return None
    where = f" WHERE {m.group('where')}" if m.group("where") else ""
    return (
        f"SELECT {m.group('select')}, _row_id AS {SRC_ROW_ID} "
        f"FROM {m.group('rel')}{where}"
    )


# hidden pair-lineage columns for two-table inner-join SPJ views: an
# output row is identified by the (rid_a, rid_b) of the source-row pair
# that produced it, so changelog delete maintenance becomes MoR equality
# deletes on two long keys (bounds-prunable — storage range-clusters on
# rid_a) instead of a content join against the whole storage (VERDICT r10
# #2: O(|V|) read per delta refresh of a large join MV).
SRC_ROW_ID_A = "__sg_src_row_id_a"
SRC_ROW_ID_B = "__sg_src_row_id_b"


def join_lineage_sql(sql: str) -> str | None:
    """For a two-table inner-join SPJ view: the same SQL with BOTH sources'
    v3 ``_row_id`` carried through as the hidden pair-lineage storage
    columns. None when the shape rules it out (must classify as a "join"
    plan, no SELECT *, and each side needs a usable qualifier — an explicit
    alias, or an undotted relation name)."""
    jm = _JOIN_SHAPE_RE.match(sql.strip())
    if (
        not jm
        or _FORBIDDEN_NONJOIN_RE.search(sql)
        or _AGG_CALL_RE.search(jm.group("select"))
        or "*" in jm.group("select")
        or jm.group("rel_a").lower() == jm.group("rel_b").lower()
        or re.search(
            r"\bJOIN\b", jm.group("cond") + (jm.group("where") or ""), re.IGNORECASE
        )
    ):
        return None
    qa = jm.group("alias_a") or ("" if "." in jm.group("rel_a") else jm.group("rel_a"))
    qb = jm.group("alias_b") or ("" if "." in jm.group("rel_b") else jm.group("rel_b"))
    if not qa or not qb or qa.lower() == qb.lower():
        return None
    aa = f" {jm.group('alias_a')}" if jm.group("alias_a") else ""
    ab = f" {jm.group('alias_b')}" if jm.group("alias_b") else ""
    where = f" WHERE {jm.group('where')}" if jm.group("where") else ""
    return (
        f"SELECT {jm.group('select')}, {qa}._row_id AS {SRC_ROW_ID_A}, "
        f"{qb}._row_id AS {SRC_ROW_ID_B} "
        f"FROM {jm.group('rel_a')}{aa} JOIN {jm.group('rel_b')}{ab} "
        f"ON {jm.group('cond')}{where}"
    )


_EQUI_COND_RE = re.compile(
    r"^\s*(?P<l>[A-Za-z_]\w*)\.(?P<lc>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<r>[A-Za-z_]\w*)\.(?P<rc>[A-Za-z_]\w*)\s*$"
)

# LEFT-outer-join SPJ views (r13, VERDICT r12 #2): ``A LEFT JOIN dim``
# (preserve unmatched facts) is a very common production MV. The same
# pair-lineage storage carries it — matched output rows key
# (rid_a, rid_b), null-extended rows (rid_a, NULL) — and because every
# output row of a LEFT join is a function of ONE A-row and all of B,
# maintenance is an affected-A-row recompute: eq-delete by rid_a alone
# (catches both the matched and the null-extended rows of an affected
# A-row), re-derive those A-rows' full contribution against B_new.
_LEFT_JOIN_SHAPE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+"
    r"(?P<rel_a>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!LEFT\b|JOIN\b)(?P<alias_a>[A-Za-z_]\w*))?"
    r"\s+LEFT\s+(?:OUTER\s+)?JOIN\s+"
    r"(?P<rel_b>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!ON\b)(?P<alias_b>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<cond>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_FORBIDDEN_LEFTJOIN_RE = re.compile(
    r"\b(union|intersect|except|distinct|over|limit|order\s+by|having"
    r"|group\s+by|right|full|cross|semi|anti)\b|\(\s*select\b",
    re.IGNORECASE,
)


def _left_join_match(sql: str):
    """The LEFT-join shape match + (qa, qb), or None. The affected-row
    machinery needs usable, distinct qualifiers on BOTH sides and an
    AND-conjoined ON containing at least one two-sided equality (the
    key-superset that makes the affected-A-row set computable; theta
    conjuncts are fine — the equality pairs stay necessary). OR'd or
    parenthesized conditions, self-joins, aggregates, and SELECT * all
    route to a full refresh."""
    jm = _LEFT_JOIN_SHAPE_RE.match(sql.strip())
    if not jm or _FORBIDDEN_LEFTJOIN_RE.search(sql):
        return None
    if jm.group("rel_a").lower() == jm.group("rel_b").lower():
        return None
    if re.search(
        r"\bJOIN\b", jm.group("cond") + (jm.group("where") or ""), re.IGNORECASE
    ):
        return None  # 3+ relations: full refresh for outer shapes
    if _AGG_CALL_RE.search(jm.group("select")) or "*" in jm.group("select"):
        return None
    qa = (jm.group("alias_a") or ("" if "." in jm.group("rel_a") else jm.group("rel_a"))).lower()
    qb = (jm.group("alias_b") or ("" if "." in jm.group("rel_b") else jm.group("rel_b"))).lower()
    if not qa or not qb or qa == qb:
        return None
    cond = jm.group("cond")
    if "(" in cond or re.search(r"\bor\b", cond, re.IGNORECASE):
        return None
    pairs = equi_pairs_between(cond, qa, qb)
    if not pairs:
        return None
    return jm, qa, qb, pairs


def classify_left_join_sql(sql: str) -> IncrementalPlan | None:
    """Two-table LEFT-outer-join select-project-filter views:
    maintainable via affected-A-row recompute (see
    engine._incremental_left_join_refresh). ``equi_keys`` carries the
    (col on A, col on B) pairs the affected-set computation keys on."""
    m = _left_join_match(sql)
    if m is None:
        return None
    jm, _, _, pairs = m
    return IncrementalPlan(
        "left_join",
        jm.group("rel_a"),
        relation_b=jm.group("rel_b"),
        equi_keys=tuple(pairs),
    )


def left_join_lineage_sql(sql: str) -> str | None:
    """The pair-lineage-instrumented rewrite of a LEFT-join SPJ view SQL
    — identical to the inner-join rewrite except the join keyword;
    ``rid_b`` is naturally NULL on null-extended rows."""
    m = _left_join_match(sql)
    if m is None:
        return None
    jm, qa, qb, _ = m
    aa = f" {jm.group('alias_a')}" if jm.group("alias_a") else ""
    ab = f" {jm.group('alias_b')}" if jm.group("alias_b") else ""
    where = f" WHERE {jm.group('where')}" if jm.group("where") else ""
    return (
        f"SELECT {jm.group('select')}, {qa}._row_id AS {SRC_ROW_ID_A}, "
        f"{qb}._row_id AS {SRC_ROW_ID_B} "
        f"FROM {jm.group('rel_a')}{aa} LEFT JOIN {jm.group('rel_b')}{ab} "
        f"ON {jm.group('cond')}{where}"
    )

# n-relation inner-join SPJ views (r12 added n=3; r13 generalizes to a
# relation LIST, VERDICT r12 #1): row lineage generalizes slot-wise — an
# inner join emits one output row per matching (r_0, …, r_{n-1}) source-row
# tuple, so the rid tuple is a key of the view multiset and delete
# maintenance is MoR equality deletes on the n long columns.
SRC_ROW_ID_C = "__sg_src_row_id_c"

# classifier bound, not an algebra limit: each extra relation adds one
# telescoped delta arm (n full-side scans), so refresh cost is O(n²) scans
# of PRUNED slots — fine for star schemas (TPC-H q5 is n=6), but a
# 20-relation chain almost certainly wants a full refresh anyway.
MAX_JOIN_RELATIONS = 8


def src_row_id_cols(n: int) -> list[str]:
    """The hidden per-slot lineage column names for an n-relation join
    view. Slots 0-2 keep the r11/r12 names (_a/_b/_c) so storages created
    before the r13 generalization keep their rid fast path; slot 3+ are
    numbered."""
    legacy = [SRC_ROW_ID_A, SRC_ROW_ID_B, SRC_ROW_ID_C]
    return [legacy[i] if i < 3 else f"__sg_src_row_id_{i}" for i in range(n)]


@dataclass(frozen=True)
class JoinChain:
    """A parsed ``FROM r0 [a0] JOIN r1 [a1] ON c1 … [WHERE w] [GROUP BY g]``
    tail — the iterative replacement for the r12 hard-coded 2/3-slot shape
    regexes. ``conds[i]`` is the ON condition attached to slot ``i + 1``
    and may reference ANY earlier slot (the real TPC-H q5 joins supplier
    to both lineitem and customer in one ON)."""

    select: str
    rels: tuple  # relation names, join order
    aliases: tuple  # SQL alias or None, per slot
    quals: tuple  # lower-cased usable qualifier per slot ("" when none)
    conds: tuple  # len(rels) - 1 ON conditions
    where: str | None
    group: str | None
    having: str | None = None  # r13: evaluated by the recompute, not the probe


_CHAIN_SHAPE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<tail>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
    r"(?:\s+HAVING\s+(?P<having>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CHAIN_HEAD_RE = re.compile(
    r"^(?P<rel>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?P<alias>[A-Za-z_]\w*))?$",
    re.IGNORECASE,
)
_CHAIN_JOIN_RE = re.compile(
    r"^(?P<rel>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!ON\b)(?P<alias>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<cond>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def parse_join_chain(sql: str) -> JoinChain | None:
    """Parse an inner-join chain of ANY length (the caller applies the
    forbidden-shape regexes and relation-count bounds). None when the
    FROM tail is not a plain ``rel [alias] (JOIN rel [alias] ON cond)*``
    sequence."""
    m = _CHAIN_SHAPE_RE.match(sql.strip())
    if not m:
        return None
    parts = re.split(
        r"\s+(?:INNER\s+)?JOIN\s+", m.group("tail").strip(), flags=re.IGNORECASE
    )
    hm = _CHAIN_HEAD_RE.match(parts[0].strip())
    if not hm:
        return None
    rels, aliases, conds = [hm.group("rel")], [hm.group("alias")], []
    for part in parts[1:]:
        jm = _CHAIN_JOIN_RE.match(part.strip())
        if not jm:
            return None
        rels.append(jm.group("rel"))
        aliases.append(jm.group("alias"))
        conds.append(jm.group("cond").strip())
    quals = tuple(
        (a or ("" if "." in r else r)).lower() for r, a in zip(rels, aliases)
    )
    return JoinChain(
        m.group("select").strip(),
        tuple(rels),
        tuple(aliases),
        quals,
        tuple(conds),
        m.group("where"),
        m.group("group"),
        m.group("having"),
    )


def _chain_match(sql: str, agg: bool) -> JoinChain | None:
    """The n-relation (3 ≤ n ≤ MAX_JOIN_RELATIONS) chain match + validity
    shared by the joinN classifiers, the lineage rewrite, and the
    equi-key extractor. ``agg`` selects the GROUP-BY-permitting forbidden
    set and requires/forbids the GROUP BY tail accordingly."""
    forbidden = _FORBIDDEN_JOINAGG_RE if agg else _FORBIDDEN_NONJOIN_RE
    if forbidden.search(sql):
        return None
    ch = parse_join_chain(sql)
    if ch is None or not 3 <= len(ch.rels) <= MAX_JOIN_RELATIONS:
        return None
    if (ch.group is not None) != agg:
        return None
    if len({r.lower() for r in ch.rels}) != len(ch.rels):
        return None  # self-joins: row identity across slots is ambiguous
    return ch


def _chain_from_sql(ch: JoinChain) -> str:
    """Reassemble the chain's FROM/ON/WHERE tail (no GROUP BY)."""
    frm = ch.rels[0] + (f" {ch.aliases[0]}" if ch.aliases[0] else "")
    for r, a, c in zip(ch.rels[1:], ch.aliases[1:], ch.conds):
        frm += f" JOIN {r}" + (f" {a}" if a else "") + f" ON {c}"
    return frm + (f" WHERE {ch.where}" if ch.where else "")


def _pairs_by_slot(
    conds, quals
) -> dict[tuple[int, int], list[tuple[str, str]]]:
    """{(i, j): [(col on rel_i, col on rel_j), …]} for every two-sided
    equality between distinct slots across all ON conditions (i < j).
    Conditions containing OR or parentheses contribute nothing (a
    disjunct could join outside any conjunct's key set); theta conjuncts
    are skipped — the remaining equality pairs stay a NECESSARY join
    condition, so pruning by them is sound."""
    idx = {q: i for i, q in enumerate(quals) if q}
    out: dict[tuple[int, int], list[tuple[str, str]]] = {}
    for cond in conds:
        if "(" in cond or re.search(r"\bor\b", cond, re.IGNORECASE):
            continue
        # the shared conjunct parser per qualifier pair, so orientation /
        # theta-skip rules live in ONE place (review r12)
        for qx, x in idx.items():
            for qy, y in idx.items():
                if x >= y:
                    continue
                p = equi_pairs_between(cond, qx, qy)
                if p:
                    out.setdefault((x, y), []).extend(p)
    return out


def joinN_lineage_sql(sql: str) -> str | None:
    """The slot-lineage-instrumented rewrite of an n-relation inner-join
    SPJ view SQL, or None when the shape rules it out (aggregates,
    SELECT *, a slot without a usable qualifier)."""
    ch = _chain_match(sql, agg=False)
    if ch is None:
        return None
    if (
        _AGG_CALL_RE.search(ch.select)
        or "*" in ch.select
        or any(not q for q in ch.quals)
        or len(set(ch.quals)) != len(ch.quals)
    ):
        return None
    rid_proj = ", ".join(
        f"{q}._row_id AS {c}"
        for q, c in zip(ch.quals, src_row_id_cols(len(ch.rels)))
    )
    return f"SELECT {ch.select}, {rid_proj} FROM {_chain_from_sql(ch)}"


def joinN_equi_keys(sql: str) -> dict[tuple[int, int], list[tuple[str, str]]] | None:
    """Per-slot-pair equality keys of an n-relation SPJ chain (see
    ``_pairs_by_slot`` for the soundness rules)."""
    ch = _chain_match(sql, agg=False)
    if ch is None:
        return None
    if any(not q for q in ch.quals) or len(set(ch.quals)) != len(ch.quals):
        return None
    return _pairs_by_slot(ch.conds, ch.quals) or None


# r12 names — the n=3 calls are bit-identical through the general parser
join3_lineage_sql = joinN_lineage_sql
join3_equi_keys = joinN_equi_keys


def classify_joinN_sql(sql: str) -> IncrementalPlan | None:
    """n-relation inner-join select-project-filter views (3 ≤ n ≤
    MAX_JOIN_RELATIONS): maintainable via the telescoping delta identity
    (see engine._incremental_joinN_refresh). The reference's __delta__
    placeholders stop at registering source deltas
    (materialized_view.rs:147-159); r12 implemented the n=3 member with
    hard-coded slots, r13 generalizes to a relation list."""
    ch = _chain_match(sql, agg=False)
    if ch is None or _AGG_CALL_RE.search(ch.select):
        return None
    return IncrementalPlan(
        "joinN",
        ch.rels[0],
        relation_b=ch.rels[1],
        relation_c=ch.rels[2],
        relations=ch.rels,
    )


def classify_joinN_agg_sql(sql: str) -> IncrementalPlan | None:
    """n-relation inner-join GROUP BY views — the REAL TPC-H q5 is the
    n=6 member (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈
    region + region filter + GROUP BY nation). Maintenance mirrors the
    2-table join_agg: affected groups from the group-key projection over
    the n telescoped delta arms, exact recompute of only those groups,
    group-keyed eq-delete + append commit. None → full refresh."""
    from iceberg_rust_custom_spark.ddl import _split_top_level

    ch = _chain_match(sql, agg=True)
    if ch is None:
        return None
    key_exprs = tuple(k.strip() for k in _split_top_level(ch.group))
    if not key_exprs or not all(_valid_agg_key_expr(k) for k in key_exprs):
        return None
    if len({q for q in ch.quals if q}) != sum(1 for q in ch.quals if q):
        return None  # duplicate qualifiers
    sel_keys: list[tuple[str, str]] = []
    agg_seen = False
    for item in _split_top_level(ch.select):
        item = item.strip()
        if _JOINAGG_ITEM_RE.match(item):
            agg_seen = True
            continue
        parsed = _agg_key_item(item, key_exprs)
        if parsed is None:
            return None
        sel_keys.append(parsed)
    if not agg_seen or not sel_keys:
        return None
    if {e for e, _ in sel_keys} != set(key_exprs):
        return None
    out_names = tuple(n for _, n in sel_keys)
    if len(out_names) != len(set(out_names)):
        return None
    proj = ", ".join(f"{e} AS {n}" for e, n in sel_keys)
    probe_sql = f"SELECT {proj} FROM {_chain_from_sql(ch)}"
    idx = {q: i for i, q in enumerate(ch.quals) if q}
    pairs = _pairs_by_slot(ch.conds, ch.quals)
    key_sources: list[tuple | None] = []
    for expr, _ in sel_keys:
        dm = _DTRUNC_QUAL_KEY_RE.fullmatch(expr)
        if dm:
            q = (dm.group("q") or "").lower()
            key_sources.append(
                (idx[q], dm.group("col"), dm.group("unit").lower())
                if q in idx
                else None
            )
        elif "." in expr:
            q, col = expr.split(".", 1)
            key_sources.append((idx[q.lower()], col) if q.lower() in idx else None)
        else:
            key_sources.append(None)
    return IncrementalPlan(
        "joinN_agg",
        ch.rels[0],
        group_keys=out_names,
        relation_b=ch.rels[1],
        relation_c=ch.rels[2],
        probe_sql=probe_sql,
        equi_keys=tuple((ij, tuple(p)) for ij, p in sorted(pairs.items())),
        key_sources=tuple(key_sources),
        relations=ch.rels,
    )


# join + GROUP BY views (r12, VERDICT r11 #2 — the TPC-H q5 star shape):
# same two-relation inner-join FROM clause, mandatory GROUP BY tail
_JOIN_AGG_SHAPE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+"
    r"(?P<rel_a>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!JOIN\b|INNER\b)(?P<alias_a>[A-Za-z_]\w*))?"
    r"\s+(?:INNER\s+)?JOIN\s+"
    r"(?P<rel_b>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!ON\b)(?P<alias_b>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<cond>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"\s+GROUP\s+BY\s+(?P<group>.*?)"
    r"(?:\s+HAVING\s+(?P<having>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# affected groups are RECOMPUTED exactly (not merged), so any
# deterministic aggregate qualifies — whitelisted to keep surprises out
_JOINAGG_ITEM_RE = re.compile(
    r"^\s*(?:sum|count|min|max|avg|mean|median|corr|covar_pop|covar_samp"
    r"|stddev(?:_pop|_samp)?|var(?:iance|_pop|_samp)?)\s*\(.*\)"
    r"\s+AS\s+[A-Za-z_]\w*\s*$",
    re.IGNORECASE | re.DOTALL,
)
_KEY_ITEM_RE = re.compile(
    r"^(?P<expr>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?$",
    re.IGNORECASE,
)
# r13: date_trunc over an optionally-qualified column is also a legal
# join-agg group key — the time-rollup-over-a-join MV. The engine prunes
# the owning side by the raw-column envelope (see
# Engine._dtrunc_envelope_predicate); the affected-group recompute is
# already exact for any deterministic key expression.
_DTRUNC_QUAL_KEY_RE = re.compile(
    r"^date_trunc\(\s*'(?P<unit>year|quarter|month|week|day|hour)'\s*,\s*"
    r"(?:(?P<q>[A-Za-z_]\w*)\.)?(?P<col>[A-Za-z_]\w*)\s*\)$",
    re.IGNORECASE,
)


def _agg_key_item(item: str, key_exprs: tuple) -> tuple[str, str] | None:
    """Parse a select-list group-key item of a join-agg view: a plain or
    qualified column, or a ``date_trunc('unit', [q.]col)`` expression —
    which must carry an alias (it names the storage column the refresh
    eq-deletes by). Returns (source expr, output name), or None when the
    item is not a projection of a GROUP BY key."""
    km = _AGGREC_KEY_RE.fullmatch(item)
    if not km or km.group("expr").strip() not in key_exprs:
        return None
    expr = km.group("expr").strip()
    alias = km.group("alias")
    if alias is None:
        if not _KEY_ITEM_RE.fullmatch(expr):
            return None  # expression key must name its storage column
        alias = expr.split(".")[-1]
    return expr, alias


def _valid_agg_key_expr(k: str) -> bool:
    return bool(
        (_KEY_ITEM_RE.fullmatch(k) and " " not in k)
        or _DTRUNC_QUAL_KEY_RE.fullmatch(k)
    )


def classify_join_agg_sql(sql: str) -> IncrementalPlan | None:
    """Shape-match a two-table inner-join GROUP BY view (the most common
    production MV — the reference registers ``__delta__`` placeholders for
    exactly this and never implements it, materialized_view.rs:147-159).
    Maintenance recomputes ONLY the affected groups, so any whitelisted
    deterministic aggregate works (AVG/STDDEV included — unlike the
    single-table merge path, nothing needs to be decomposable); group keys
    must be plain or singly-qualified columns, each projected in the
    select list. None → full refresh."""
    from iceberg_rust_custom_spark.ddl import _split_top_level

    jm = _JOIN_AGG_SHAPE_RE.match(sql.strip())
    if not jm or _FORBIDDEN_JOINAGG_RE.search(sql):
        return None
    if jm.group("rel_a").lower() == jm.group("rel_b").lower():
        return None  # self-join: row identity across sides is ambiguous
    if re.search(
        r"\bJOIN\b", jm.group("cond") + (jm.group("where") or ""), re.IGNORECASE
    ):
        return None  # 3+ relations
    key_exprs = tuple(k.strip() for k in _split_top_level(jm.group("group")))
    if not key_exprs or not all(_valid_agg_key_expr(k) for k in key_exprs):
        return None
    qa = (
        jm.group("alias_a") or ("" if "." in jm.group("rel_a") else jm.group("rel_a"))
    ).lower()
    qb = (
        jm.group("alias_b") or ("" if "." in jm.group("rel_b") else jm.group("rel_b"))
    ).lower()
    if qa and qa == qb:
        return None
    sel_keys: list[tuple[str, str]] = []  # (source expr, output name)
    agg_seen = False
    for item in _split_top_level(jm.group("select")):
        item = item.strip()
        if _JOINAGG_ITEM_RE.match(item):
            agg_seen = True
            continue
        parsed = _agg_key_item(item, key_exprs)
        if parsed is None:
            return None  # derived/unaliased expression: full refresh
        sel_keys.append(parsed)
    if not agg_seen or not sel_keys:
        return None
    if {e for e, _ in sel_keys} != set(key_exprs):
        return None  # a GROUP BY key missing from the projection (or vice
        # versa): storage couldn't eq-delete by the full group key
    out_names = tuple(n for _, n in sel_keys)
    if len(out_names) != len(set(out_names)):
        return None
    aa = f" {jm.group('alias_a')}" if jm.group("alias_a") else ""
    ab = f" {jm.group('alias_b')}" if jm.group("alias_b") else ""
    where = f" WHERE {jm.group('where')}" if jm.group("where") else ""
    proj = ", ".join(f"{e} AS {n}" for e, n in sel_keys)
    probe_sql = (
        f"SELECT {proj} FROM {jm.group('rel_a')}{aa} JOIN {jm.group('rel_b')}{ab} "
        f"ON {jm.group('cond')}{where}"
    )
    cond = jm.group("cond")
    pairs = None
    if qa and qb and "(" not in cond and not re.search(r"\bor\b", cond, re.IGNORECASE):
        pairs = equi_pairs_between(cond, qa, qb)
    key_sources: list[tuple | None] = []
    for expr, _ in sel_keys:
        dm = _DTRUNC_QUAL_KEY_RE.fullmatch(expr)
        if dm:
            q = (dm.group("q") or "").lower()
            side = "a" if (qa and q == qa) else ("b" if (qb and q == qb) else None)
            key_sources.append(
                (side, dm.group("col"), dm.group("unit").lower()) if side else None
            )
        elif "." in expr:
            q, col = expr.split(".", 1)
            if qa and q.lower() == qa:
                key_sources.append(("a", col))
            elif qb and q.lower() == qb:
                key_sources.append(("b", col))
            else:
                key_sources.append(None)
        else:
            key_sources.append(None)  # side unknown: recompute without pruning
    return IncrementalPlan(
        "join_agg",
        jm.group("rel_a"),
        group_keys=out_names,
        relation_b=jm.group("rel_b"),
        probe_sql=probe_sql,
        equi_keys=tuple(pairs or ()),
        key_sources=tuple(key_sources),
    )


def join_equi_keys(sql: str) -> list[tuple[str, str]] | None:
    """[(key column on rel_a, key column on rel_b), …] — one pair per
    two-sided equality in the join's AND-conjoined ON condition — the
    shape that lets delta-join refresh FILE-PRUNE the full-side arms by
    the delta's key values (r11: at ×1000 the A_old/B_new scans dominate
    refresh wall; r12 extends single-key to compound keys, VERDICT r11
    #1). Conjuncts that are NOT two-sided equalities (theta terms like
    ``a.x < b.y``) are simply skipped: the equality pairs alone remain a
    NECESSARY condition for a row to join, so pruning by them stays
    sound. None when no usable pair exists, or when the condition
    contains OR / parentheses (a disjunct could join outside any single
    conjunct's key set — arms then read the full side, correct either
    way)."""
    jm = _JOIN_SHAPE_RE.match(sql.strip())
    if not jm:
        return None
    cond = jm.group("cond")
    if "(" in cond or re.search(r"\bor\b", cond, re.IGNORECASE):
        return None
    qa = (jm.group("alias_a") or jm.group("rel_a")).lower()
    qb = (jm.group("alias_b") or jm.group("rel_b")).lower()
    return equi_pairs_between(cond, qa, qb)


def equi_pairs_between(cond: str, qa: str, qb: str) -> list[tuple[str, str]] | None:
    """The (col on qa, col on qb) pairs from an AND-conjoined condition's
    two-sided equalities between the two given qualifiers (lower-cased).
    Shared by the 2-table and n-table classifiers. The caller has already
    rejected OR / parenthesized conditions."""
    pairs: list[tuple[str, str]] = []
    for conjunct in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        m = _EQUI_COND_RE.match(conjunct)
        if not m:
            continue  # theta conjunct: equality pairs alone still prune soundly
        left, right = m.group("l").lower(), m.group("r").lower()
        if left == qa and right == qb:
            pairs.append((m.group("lc"), m.group("rc")))
        elif left == qb and right == qa:
            pairs.append((m.group("rc"), m.group("lc")))
        # one-sided conjuncts (a.x = a.y) carry no cross-relation key: skip
    return pairs or None


# expression group keys the agg_recompute path can FILE-PRUNE the source
# by: date_trunc('unit', col) maps to a raw-column envelope (every row of
# an affected group has col in [min_bucket, max_bucket + 1 unit)); other
# deterministic single-column expressions stay row-level-only (opaque)
_DTRUNC_KEY_RE = re.compile(
    r"^date_trunc\(\s*'(?P<unit>year|quarter|month|week|day|hour)'\s*,\s*"
    r"(?P<col>[A-Za-z_]\w*)\s*\)$",
    re.IGNORECASE,
)
# a group-key EXPRESSION in the select list must carry an alias (it names
# the storage column the refresh eq-deletes by); plain columns default
_AGGREC_KEY_RE = re.compile(
    r"^(?P<expr>.+?)(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?$",
    re.IGNORECASE | re.DOTALL,
)
# non-date_trunc expression keys admitted by the agg-recompute path: a
# DETERMINISTIC single-column function whitelist (review r13 — the old
# "any parenthesized expression" rule admitted current_date()/rand()
# keys, whose affected-group commits would mix two key epochs in storage)
_DETERMINISTIC_KEY_FN_RE = re.compile(
    r"^(?:upper|lower|trim|ltrim|rtrim|abs|floor|ceil|year|quarter|month"
    r"|day|dayofmonth|dayofweek|hour|minute|to_date|length)"
    r"\(\s*[A-Za-z_]\w*\s*\)$",
    re.IGNORECASE,
)


def classify_agg_recompute_sql(sql: str) -> IncrementalPlan | None:
    """Single-table GROUP BY views the partial-merge path rejects —
    non-decomposable aggregates (AVG/STDDEV/MEDIAN/…) or expression group
    keys (``GROUP BY date_trunc('month', ts)``, the standard time-rollup
    MV). Maintenance recomputes ONLY the affected groups (VERDICT r12
    #3): probe = the group-key projection over the source delta, exact
    recompute of those groups from a key-pruned source scan, group-keyed
    eq-delete + append commit. The n-table join_agg machinery proved the
    strategy (engine.py join_agg r12); the single-table case is the same
    minus the join. None → full refresh."""
    from iceberg_rust_custom_spark.ddl import _split_top_level

    m = _SHAPE_RE.match(sql.strip())
    if not m or _FORBIDDEN_RE.search(sql) or not m.group("group"):
        return None
    key_exprs = tuple(k.strip() for k in _split_top_level(m.group("group")))
    if not key_exprs:
        return None
    specs: dict[str, tuple] = {}  # key expr -> pruning spec
    for k in key_exprs:
        if re.fullmatch(r"[A-Za-z_]\w*", k):
            specs[k] = ("col", k)
        else:
            dm = _DTRUNC_KEY_RE.fullmatch(k)
            if dm:
                specs[k] = ("dtrunc", dm.group("col"), dm.group("unit").lower())
            elif _DETERMINISTIC_KEY_FN_RE.fullmatch(k):
                specs[k] = ("opaque",)  # deterministic, but no file pruning
            else:
                # anything else may be nondeterministic or time-dependent
                # (current_date(), rand(), …) — an affected-group commit
                # would mix two key epochs in storage (review r13): full
                # refresh, never a wrong answer
                return None
    sel_keys: list[tuple[str, str]] = []  # (source expr, output name)
    agg_seen = False
    for item in _split_top_level(m.group("select")):
        item = item.strip()
        if _JOINAGG_ITEM_RE.match(item):
            agg_seen = True
            continue
        parsed = _agg_key_item(item, key_exprs)
        if parsed is None:
            return None  # derived non-key expression: full refresh
        sel_keys.append(parsed)
    if not agg_seen or not sel_keys:
        return None
    if {e for e, _ in sel_keys} != set(key_exprs):
        return None  # every GROUP BY key must be projected (eq-delete key)
    out_names = tuple(nm for _, nm in sel_keys)
    if len(out_names) != len(set(out_names)):
        return None
    rel = m.group("rel")
    where = f" WHERE {m.group('where')}" if m.group("where") else ""
    proj = ", ".join(f"{e} AS {nm}" for e, nm in sel_keys)
    return IncrementalPlan(
        "agg_recompute",
        rel,
        group_keys=out_names,
        probe_sql=f"SELECT {proj} FROM {rel}{where}",
        key_sources=tuple(specs[e] for e, _ in sel_keys),
    )


def classify_view_sql(sql: str) -> IncrementalPlan | None:
    """Shape-match the view SQL; None means "not incrementally
    maintainable, do a full refresh". Deliberately conservative: one
    catalog relation, no joins/set-ops/windows/subqueries; aggregates
    restricted to the decomposable SUM/COUNT/MIN/MAX (partial merge) —
    non-decomposable aggregates and expression keys route to the
    affected-group recompute classifier (r13)."""
    from iceberg_rust_custom_spark.ddl import _split_top_level

    if _FORBIDDEN_RE.search(sql):
        jm = _JOIN_SHAPE_RE.match(sql.strip())
        if (
            jm
            and not _FORBIDDEN_NONJOIN_RE.search(sql)
            and not _AGG_CALL_RE.search(jm.group("select"))
            and jm.group("rel_a").lower() != jm.group("rel_b").lower()
            and not re.search(  # exactly two relations: no JOIN in the tail
                r"\bJOIN\b", jm.group("cond") + (jm.group("where") or ""), re.IGNORECASE
            )
        ):
            # two-relation inner equi/theta join, select-project-filter only:
            # maintainable via the delta-join identity (see join refresh)
            return IncrementalPlan("join", jm.group("rel_a"), relation_b=jm.group("rel_b"))
        # n-relation inner join (r12: n=3; r13: relation list up to
        # MAX_JOIN_RELATIONS): telescoping delta identity
        planN = classify_joinN_sql(sql)
        if planN is not None:
            return planN
        # join + GROUP BY, 2..n relations: affected-group recompute
        planNa = classify_joinN_agg_sql(sql)
        if planNa is not None:
            return planNa
        plan2a = classify_join_agg_sql(sql)
        if plan2a is not None:
            return plan2a
        # LEFT-outer SPJ (r13): affected-A-row recompute
        return classify_left_join_sql(sql)
    m = _SHAPE_RE.match(sql.strip())
    if not m:
        return None
    rel = m.group("rel")
    group = m.group("group")
    if m.group("having"):
        # the partial-merge path cannot drop HAVING-failing groups; the
        # affected-group recompute evaluates HAVING naturally (r13) — a
        # recomputed group failing it is eq-deleted and not re-appended
        return classify_agg_recompute_sql(sql) if group is not None else None
    if group is None:
        return IncrementalPlan("append", rel)

    keys = tuple(k.strip() for k in _split_top_level(group))
    if not all(re.fullmatch(r"[A-Za-z_]\w*", k) for k in keys):
        # expression keys (date_trunc rollups): affected-group recompute
        return classify_agg_recompute_sql(sql)
    merge_ops: dict[str, str] = {}
    for item in _split_top_level(m.group("select")):
        item = item.strip()
        if item in keys:
            continue
        am = _AGG_RE.match(item)
        if not am:
            # AVG/STDDEV/aliased-key shapes: affected-group recompute
            return classify_agg_recompute_sql(sql)
        merge_ops[am.group("alias")] = _MERGEABLE[am.group("fn").lower()]
    if not merge_ops:
        return classify_agg_recompute_sql(sql)
    return IncrementalPlan("aggregate", rel, keys, merge_ops)


def appends_only_since(metadata, last_snapshot_id: int) -> bool:
    """True iff every snapshot after ``last_snapshot_id`` (by sequence
    number) is an append. Overwrites invalidate delta maintenance."""
    return history_kind(metadata, last_snapshot_id) == "appends"


def history_kind(metadata, last_snapshot_id: int) -> str | None:
    """Classify the source history since the anchor snapshot:

    * ``"appends"`` — every commit is an append (or metadata-only
      'replace'): the cheap delta paths (incremental_scan) are sound.
    * ``"changelog"`` — at least one MoR row-level commit (DELETE /
      UPDATE / MERGE / equality delete) but every commit is
      changelog-replayable (the same rule ``Table.changes`` enforces:
      append/delete/replace, or 'overwrite' without the rewritten=true
      file-set-replacement marker): maintenance via the row-level
      changelog is sound (r8 — previously any non-append forced a full
      refresh).
    * ``None`` — a net-row-change file-set replacement (CoW row-level op,
      dynamic overwrite) is in the range: row identity is gone, full
      refresh required. Zero-net-change rewrites (compact / zorder /
      rewrite_position_deletes, summary ``lineage-preserved=true``) are
      NOT in this class (r9): the changelog replays straight through them
      (``Table.changes`` splits the range at the rewrite), so they only
      downgrade ``appends`` → ``changelog`` — routine compaction no longer
      forces a full MV refresh. (Downgrade, not ignore: the cheap
      ``incremental_scan`` path plans files by sequence range, and a
      compaction re-stamps every row into new files at its own sequence
      number — only the segment-aware changelog path is sound.)
    """
    last = metadata.snapshots.get(last_snapshot_id)
    if last is None:
        return None  # expired or rewritten away — no anchor for a delta
    kind = "appends"
    for s in metadata.snapshots.values():
        if s.sequence_number > last.sequence_number:
            op = s.summary.get("operation")
            if op in ("append", "replace"):
                continue
            if op == "delete" or (
                op == "overwrite"
                and (
                    s.summary.get("rewritten") != "true"
                    or s.summary.get("lineage-preserved") == "true"
                )
            ):
                kind = "changelog"
            else:
                return None
    return kind


def merge_partial_aggregates(stored, delta, plan: IncrementalPlan):
    """Combine the storage table's aggregate rows with the delta's, per
    group: full outer join on the keys, then sum/min/max per column. One
    small-side shuffle — both inputs are aggregate-sized, never raw-data-
    sized."""
    from pyspark.sql import functions as F

    d = delta
    for c in d.columns:
        d = d.withColumnRenamed(c, f"_d_{c}")
    cond = None
    for k in plan.group_keys:
        eq = stored[k].eqNullSafe(d[f"_d_{k}"])
        cond = eq if cond is None else (cond & eq)
    joined = stored.join(d, cond, "full_outer")
    out = [
        F.coalesce(stored[k], d[f"_d_{k}"]).alias(k) for k in plan.group_keys
    ]
    for col, op in plan.merge_ops.items():
        a, b = stored[col], d[f"_d_{col}"]
        if op == "sum":
            merged = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)
        elif op == "min":
            merged = F.least(a, b)  # least/greatest skip nulls
        else:
            merged = F.greatest(a, b)
        out.append(merged.alias(col))
    return joined.select(*out)
