"""Broadcast (small-side) evaluator for one fixpoint iteration.

When the fact store fits comfortably in a single worker's memory, the
cheapest-possible physical plan for a rule-body join chain is a
vectorized hash join against an in-memory Arrow/polars table — the same
small-side-broadcast optimization Spark/DataFusion apply automatically.
The fixpoint driver (:mod:`rify_ray.engine`) picks this evaluator when
``full.count() <= broadcast_threshold`` and the shuffle evaluator
(:mod:`rify_ray.eval_shuffle`, real ``Dataset.join`` exchanges) above it.

Semantics mirrored from the reference:

- seeded semi-naive chains per delta position (``apply_related``,
  ``/root/reference/src/reasoner.rs:131-155``);
- intra-atom repeated variables constrain equality (``can_match``,
  ``src/reasoner.rs:266-274``);
- head projection substitutes bindings into ``then`` atoms
  (``local_to_global``, ``src/reasoner.rs:24-34``);
- derivations are deduped first-wins with a deterministic tie-break
  (rule_index, instantiations) — the distributed stand-in for the
  reference's sequential first-derivation order
  (``src/prove.rs:142-147``; see SURVEY.md §7.4 item 2).

All operations are columnar polars expressions; no Python-level row
loops anywhere.

Lineage encoding: each derivation carries a single sortable string
``lkey = f"{rule_index:06d}" + SEP + SEP.join(instantiations)`` (SEP =
``\\x1f``, the ASCII unit separator).  ``min(lkey)`` per quad is then a
deterministic first-wins pick that works identically in polars
``group_by`` and Ray Data ``groupby(...).min()`` — see
:func:`rify_ray.engine.decode_lkey`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import polars as pl

from .plan import SLOTS, AtomPlan, ChainPlan, RulePlan, vcol

FACT_COLS = list(SLOTS)
LKEY_SEP = "\x1f"
LINEAGE_COLS = ["s", "p", "o", "g", "lkey"]


def _empty_bindings(var_indices: Sequence[int]) -> pl.DataFrame:
    return pl.DataFrame(schema={vcol(i): pl.Utf8 for i in var_indices})


def match_atom(facts: pl.DataFrame, atom: AtomPlan) -> Optional[pl.LazyFrame]:
    """Filtered projection of the fact table for one body atom: apply
    constant-equality filters and intra-atom variable-equality filters,
    then project the variable columns (named ``_v{i}``).

    The projection is duplicate-free by construction — every slot is
    either a constant (fixed by the filter) or projected — so no
    ``unique()`` pass is needed.

    Returns None for an UNSATISFIED all-constant atom (presence probe),
    a lazy frame otherwise (empty lazy frame = no matches).
    """
    preds = [pl.col(c) == pl.lit(v) for c, v in atom.const_filters]
    seen: dict = {}
    for col, vi in atom.var_slots:
        if vi in seen:
            preds.append(pl.col(col) == pl.col(seen[vi]))
        else:
            seen[vi] = col
    df = facts.lazy()
    if preds:
        df = df.filter(pl.all_horizontal(preds) if len(preds) > 1 else preds[0])
    proj = [pl.col(seen[vi]).alias(vcol(vi)) for vi in atom.var_indices]
    if not proj:
        # all-constant atom: satisfied iff a matching fact exists
        n = df.select(pl.len()).collect().item()
        return pl.LazyFrame({"__one": [1]}) if n else None
    return df.select(proj)


def eval_chain(
    delta: pl.DataFrame,
    full_old: pl.DataFrame,
    full_new: pl.DataFrame,
    plan: RulePlan,
    chain: ChainPlan,
) -> Optional[pl.LazyFrame]:
    """Build the (lazy) join chain for one delta position; returns the
    binding set (one ``_v{i}`` column per canonical variable) or None
    when statically unsatisfiable.  Nothing materializes here — the
    round collects ONE fused query (joins → head projection → anti-join
    → dedup), so polars pipelines the whole thing.

    Classic semi-naive old/new split: the atom at ``chain.delta_pos``
    reads the delta; atoms at smaller original positions read the
    PRE-round store; atoms at larger positions read the post-round store
    — so each new combination is derived by exactly one of the k chains
    instead of all of them.
    """
    body = plan.body
    bindings: Optional[pl.LazyFrame] = None
    bound_cols: List[str] = []
    for step, atom_i in enumerate(chain.order):
        if step == 0:
            side = delta
        elif atom_i < chain.delta_pos:
            side = full_old
        else:
            side = full_new
        m = match_atom(side, body[atom_i])
        if m is None:
            return None  # unsatisfied all-constant atom
        m_cols = [vcol(i) for i in body[atom_i].var_indices]
        if not m_cols:
            continue  # satisfied all-constant atom
        if bindings is None:
            bindings, bound_cols = m, m_cols
            continue
        shared = [c for c in m_cols if c in bound_cols]
        if shared:
            bindings = bindings.join(m, on=shared, how="inner")
        else:
            bindings = bindings.join(m, how="cross")
        bound_cols = bound_cols + [c for c in m_cols if c not in bound_cols]
    if bindings is None:
        # body entirely constant atoms, all satisfied: single empty binding
        bindings = pl.LazyFrame({"__one": [1]})
    return bindings


def project_heads(
    plan: RulePlan, bindings: pl.LazyFrame, with_lineage: bool, fact_dtype=pl.Utf8
) -> pl.LazyFrame:
    """Substitute bindings into every ``then`` atom; emits quad columns
    plus (optionally) lineage columns rule_index / inst."""
    frames: List[pl.DataFrame] = []
    inst_expr = None
    if with_lineage:
        parts: List[pl.Expr] = [pl.lit(f"{plan.index:06d}")]
        for i in range(plan.n_vars):
            parts.append(pl.lit(LKEY_SEP))
            parts.append(pl.col(vcol(i)).cast(pl.Utf8))
        inst_expr = pl.concat_str(parts).alias("lkey")
    for atom in plan.head:
        exprs = []
        for j, (kind, v) in enumerate(atom.slots):
            if kind == "const":
                exprs.append(pl.lit(v, dtype=fact_dtype).alias(SLOTS[j]))
            else:
                exprs.append(pl.col(vcol(v)).alias(SLOTS[j]))
        if with_lineage:
            exprs.append(inst_expr)
        out_cols = [SLOTS[j] for j in range(4)] + (["lkey"] if with_lineage else [])
        # with_columns (NOT select): selecting pure literals from an
        # empty frame would fabricate one phantom row, silently firing
        # all-constant heads with zero satisfying bindings
        frames.append(bindings.with_columns(exprs).select(out_cols))
    return pl.concat(frames) if len(frames) > 1 else frames[0]


def run_iteration(
    delta: pl.DataFrame,
    full_new: pl.DataFrame,
    plans: Sequence[RulePlan],
    with_lineage: bool = False,
    full_old: Optional[pl.DataFrame] = None,
) -> pl.DataFrame:
    """One semi-naive round: for every rule and every delta position, run
    the join chain, project heads, dedup first-wins, and anti-join
    against ``full_new``.  ``full_new`` must already include ``delta``;
    ``full_old`` is the store before this delta (defaults to full_new,
    which is still correct — just does redundant work).

    Returns the new-fact frame (columns s,p,o,g [,lkey]).
    """
    if full_old is None:
        full_old = full_new
    out_cols = LINEAGE_COLS if with_lineage else FACT_COLS
    fact_dtype = full_new.schema["s"]
    derived: List[pl.LazyFrame] = []
    for plan in plans:
        if not plan.body:
            continue  # unconditional rules are fired once by the driver
        for chain in plan.chains:
            b = eval_chain(delta, full_old, full_new, plan, chain)
            if b is None:
                continue
            derived.append(project_heads(plan, b, with_lineage, fact_dtype))
    if not derived:
        return pl.DataFrame(
            schema={c: (pl.Utf8 if c == "lkey" else fact_dtype) for c in out_cols}
        )
    # anti-join FIRST (probe the big derivation stream against the small
    # store hash — Reasoner::insert dedup, src/reasoner.rs:103-127), then
    # dedup the tiny remainder.  In late rounds almost everything derived
    # is already known, so dedup-after-anti touches ~0 rows instead of
    # the full O(n^k) enumeration.  One fused lazy query per round.
    new = pl.concat(derived).join(full_new.lazy(), on=FACT_COLS, how="anti")
    if with_lineage:
        # deterministic first-wins per quad: min lkey = (rule_index, inst)
        new = new.group_by(FACT_COLS).agg(pl.col("lkey").min())
    else:
        new = new.unique(subset=FACT_COLS)
    return new.select(out_cols).collect(engine="streaming")
