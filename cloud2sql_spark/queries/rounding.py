"""Exact cross-engine rounding of integer-ratio expressions.

THE HAZARD CLASS (found empirically in round 9's sf0.1 sweep, fixed
there for the embedding means; generalized here in round 10 after a
systematic audit of every round(…/…, k) oracle site): when a rounded
value's TRUE form is a rational num/den of exact integers, it can land
EXACTLY on the k-th-decimal half boundary, where Spark (BigDecimal
HALF_UP over the double) and DuckDB (multiply by 10^k in float, then
round half away from zero) disagree by one ulp of the last digit.
Measured divergence on synthesized boundary cases: ~16% of halves for
the 2-decimal money-mean shape, ~1-3% for 6-decimal integer ratios —
i.e. a boundary hit is a coin-flip red row. Both engines are
internally consistent; only the boundary behavior differs, so the bug
is invisible until a fixture regeneration (or a bigger corpus) lands a
value exactly on a half.

THE IMMUNIZATION: compute round(num/den, k) in exact integer
arithmetic evaluated identically by both engines —

    sign(num) * ((2*|num|*10^k + den) intdiv (2*den)) / 10^k

which is half-away-from-zero by construction ((a + b/2) // b on
non-negative operands). The numerator 2*|num|*10^k rides a
128-bit-capable type on BOTH engines: Spark DECIMAL(38,0) (`div` on a
decimal numerator is exact integral division returning BIGINT) and
DuckDB HUGEINT (`//` on HUGEINT is exact; on DECIMAL it silently
degrades to DOUBLE division — so HUGEINT is mandatory there). The
quotient round(|num/den|*10^k) must fit BIGINT — automatic for every
site in this repo, where |num/den| is a bounded mean/probability/money
value; only the numerator grows with corpus size. The final
int -> double -> /10^k conversion is two correctly-rounded steps over
identical NON-NEGATIVE integers, so the output double is bit-identical
across engines. tests/test_properties.py pins both engine templates
against Fraction-exact rounding, including adversarial >int64
numerators and negative quotients beyond 2^53.

`den` must be a strictly positive exact-integer expression; `num` may
be negative. The sign is applied OUTSIDE the CAST(... AS DOUBLE), as a
-1.0/+1.0 double factor on the already-converted quotient: negating a
double is exact, whereas DuckDB's negative-HUGEINT -> DOUBLE cast
double-rounds through the value's two 64-bit two's-complement halves
and lands 1 ulp off the correctly-rounded value for |q| > 2^53
(found by the round-10 judge: num=-486665475228506, den=47775, k=6).
With the sign outside, the convention is half away from zero for
negatives too — matching what both engines already do for
representable halves — across the full |q| < 2^63 contract.

Off-boundary outputs are unchanged: the rounding grid (10^-k) is ~10
orders coarser than double error at every call site, so any value not
exactly ON a half rounds to the same grid point as before (verified by
pre/post output hashes on the live fixtures when each call site was
converted).

Converted in round 11 (their re-proof slots were already paid by the
r05 staleness window): tpch_q8, tpch_q14 (DECIMAL-scale-4 revenue
ratios — num/den integerized by 10^4), tpch_q17 (exact cents / 7),
sample_temperature (DECIMAL(18,8) weights integerized by 10^8),
sample_dedup_weighted (1/n_copies). Denominators that are DECIMAL
sums are cast to HUGEINT (DuckDB) / DECIMAL(38,0) (Spark) at the call
site — the template widens only the numerator, and DuckDB `//` on a
DECIMAL operand silently degrades to DOUBLE division.

THE PROBABILISTIC-EXEMPT CLASS IS CLOSED (round 12). Round 10 kept a
list of sites on plain round() under per-cell "P(boundary) < 1e-4"
estimates; round 11's composed perturbation x multi-split probe
falsified that policy empirically — join_theta_range, on that list,
hit its boundary on the FIRST perturbed-sf0.01 run (the money-x3
corpus put one nation's mean cent-gap exactly on a half; Spark
8063.82 vs DuckDB 8063.81). The per-regeneration probability is
small, but every probe/regeneration re-rolled the dice across ~25
exempted cells, so round 12 converted the entire residual list, each
swap proven value-preserving by pre/post output hashes on the live
fixtures (scripts/prepost_hash.py, sf0.001 + sf0.01, both engines):
text_diversity (3 ratios), agg_theil_index (final Σq/(n·1e9)),
dedup_minhash_banding_curve (final Σq/(pairs·1e9)),
agg_winsorized_stats (winsor_mean = Σwc/(100n)), embed_quantize
(mean_abs_err — refolded as the exact integer Σ|127x − qv·max_abs|
over 127·64·1000), and sample_importance_reweight's q quantization
(exact floor((2·total²·1e9 + k²n)/(2·k²n)) in DECIMAL(38,0)/HUGEINT —
NOT via `div`, which returns LONG on Spark and would clamp q's
documented >int64 headroom; the Spark side uses the exact
remainder-subtract division (numx - numx % den)/den instead).

The only sites still on a plain engine round() are now:
1. PROVABLY boundary-free by 2-adic valuation, premises pinned by
   tests/test_rounding_contract.py: win_moving_avg (7-row frame —
   every frame size in 1..7 has v2(size) <= 2 < v2(200) = 3, so
   200*S/size is even whenever integral and no odd half-quotient
   exists; a size-8 frame WOULD break this) and fn_try_arith
   (divisors user_id % 5 in {1..4}, v2 <= 2 < 7 = v2(2*10^6)).
2. Out of the class entirely — the rounded value passes through
   sqrt()/ln()/pow() (irrational off a measure-zero set, and both
   engines round the identical double): agg_winsorized_stats's
   winsor_std, agg_theil_index's per-row ln() quantum,
   dedup_minhash_banding_curve's per-pair pow() quantum. A one-ulp
   libm disagreement there moves ONE integer quantum, which the exact
   final templates absorb (it shifts the 6-decimal output only if Σq
   sits within one quantum of a grid edge — the documented last-ulp
   class, not the round() boundary class).
3. Grid-dominated round(…, 0) on a coarse rational lattice:
   embed_quantize's qv = round(x·127/max_abs) — the exact rational's
   grid spacing 1/(2·max_abs) dwarfs double error by >8 orders for
   any plausible milli-unit embedding, so the double is either
   EXACTLY z.5 (both engines round away from zero — agree) or too far
   from the half for a shortest-repr straddle. The max_abs magnitude
   premise is pinned by tests/test_rounding_contract.py.

The round(sum(raw_double_money), 2) family — agg_global, agg_rollup,
agg_cube's quantity twin, agg_having, agg_grouping_sets,
join_broadcast_dim, events_daily_fill, sink_parquet_snapshot — was
converted to exact DECIMAL(18,2) sums (CAST to DOUBLE on output) in
round 12, on the rotation slots its r07 staleness already owed
(VERDICT r10 item 4 / r11 item 1), pre/post hashes identical on the
live fixtures. Measured round 10: every such raw-double sum was
bit-identical across engines on single-split fixtures, but the class
breaks at ~1e10+ rows, where one ulp of the float sum exceeds the
cent grid and multi-partition combination order diverges; the DECIMAL
sum is exact at any scale on 2-decimal sources.
sum(l_quantity) sites are exact at any scale (integer-valued doubles,
exact to 2^53); win_running_sum's prefix sums are order-pinned by its
total window ORDER BY, so both engines add in the same sequence.

floor()/ceil() sites (21 audited) are NOT in the class: unlike
round(), both engines floor the IEEE double itself — identical inputs
give identical outputs with no shortest-repr-vs-multiply ambiguity —
so the existing mirror-the-float-association rule fully covers them.
"""

from __future__ import annotations


def ratio_round(num: str, den: str, k: int, *, div: str, wide: str) -> str:
    """SQL for exact round(num/den, k), half away from zero.

    ``num``/``den`` are SQL fragments whose values are exact integers
    (den > 0). ``div``/``wide`` select the engine dialect — use the
    :func:`ratio_round_oracle` / :func:`ratio_round_spark` wrappers.
    """
    p = 10**k
    return (
        f"CASE WHEN ({num}) < 0 THEN -1.0 ELSE 1.0 END"
        f" * CAST((2 * CAST(abs({num}) AS {wide}) * {p} + ({den}))"
        f" {div} (2 * ({den}))"
        f" AS DOUBLE) / {p}.0"
    )


def ratio_round_oracle(num: str, den: str, k: int) -> str:
    """DuckDB dialect: HUGEINT numerator, `//` integral division."""
    return ratio_round(num, den, k, div="//", wide="HUGEINT")


def ratio_round_spark(num: str, den: str, k: int) -> str:
    """Spark dialect: DECIMAL(38,0) numerator, `div` integral division
    (use inside F.expr / selectExpr)."""
    return ratio_round(num, den, k, div="div", wide="DECIMAL(38,0)")
