"""Round-9 unit tests: GIF animation container, TIFF orientation tag, and
the exact-arithmetic properties of the new time-series / stats qids."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
    decode_gif,
    decode_gif_animation,
    encode_gif,
    encode_gif_animation,
)
from hdc_dataengineering_sqlsync_spark.operators.tiff import decode_tiff, encode_tiff

# ------------------------------------------------------------ GIF animation


def _pal(n=16):
    i = np.arange(n)
    return np.stack([(i * 13) % 256, (i * 7) % 256, (i * 29) % 256], axis=1).astype(
        np.uint8
    )


def test_gif_animation_roundtrip_frames_and_delays():
    rng = np.random.default_rng(9)
    pal = _pal()
    frames = [rng.integers(0, 16, (7, 11), dtype=np.uint8) for _ in range(4)]
    delays = [0, 4, 250, 65535]
    blob = encode_gif_animation(frames, pal, delays)
    out_frames, out_delays = decode_gif_animation(blob)
    assert out_delays == delays
    assert len(out_frames) == 4
    for f, o in zip(frames, out_frames):
        assert (o == pal[f]).all()


def test_gif_animation_container_layout():
    """GIF89a signature, NETSCAPE2.0 loop extension, one GCE per frame,
    trailer byte."""
    pal = _pal()
    frames = [np.zeros((3, 4), dtype=np.uint8), np.ones((3, 4), dtype=np.uint8)]
    blob = encode_gif_animation(frames, pal, [7, 9])
    assert blob[:6] == b"GIF89a"
    assert b"NETSCAPE2.0" in blob
    assert blob.count(b"\x21\xf9\x04") == 2  # one GCE per frame
    assert blob[-1] == 0x3B
    # delays live in the GCE at byte offset 4..5 (little-endian uint16)
    first = blob.index(b"\x21\xf9\x04")
    (d0,) = struct.unpack_from("<H", blob, first + 4)
    assert d0 == 7


def test_gif_animation_single_frame_still_compatible():
    """The animation walker decodes a plain still GIF (one frame, delay 0),
    and the still decoder's output matches the walker's first frame."""
    rng = np.random.default_rng(5)
    pal = _pal()
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    still = encode_gif(idx, pal)
    frames, delays = decode_gif_animation(still)
    assert len(frames) == 1 and delays == [0]
    assert (frames[0] == decode_gif(still)).all()


def test_gif_animation_validation():
    pal = _pal()
    f = np.zeros((3, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif_animation([], pal, [])
    with pytest.raises(ValueError, match="one delay per frame"):
        encode_gif_animation([f], pal, [1, 2])
    with pytest.raises(ValueError, match="canvas size"):
        encode_gif_animation([f, np.zeros((4, 4), dtype=np.uint8)], pal, [1, 2])
    with pytest.raises(ValueError, match="uint16"):
        encode_gif_animation([f], pal, [70000])


def test_gif_animation_lzw_reset_path():
    """A frame large/noisy enough to overflow the 12-bit code space forces
    a mid-stream CLEAR reset in at least one frame — the dictionary-reset
    round-trip must survive across frames."""
    rng = np.random.default_rng(11)
    pal = _pal(16)
    frames = [rng.integers(0, 16, (64, 96), dtype=np.uint8) for _ in range(2)]
    out, _ = decode_gif_animation(encode_gif_animation(frames, pal, [1, 2]))
    for f, o in zip(frames, out):
        assert (o == pal[f]).all()


# --------------------------------------------------------- TIFF orientation


@pytest.mark.parametrize("ori", [1, 3, 6, 8])
def test_tiff_orientation_tag_roundtrip(ori):
    rng = np.random.default_rng(ori)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    blob = encode_tiff(px, rows_per_strip=4, orientation=ori)
    out, meta = decode_tiff(blob, return_meta=True)
    assert (out == px).all()  # pixels stay in file order — reader rotates
    assert meta["orientation"] == ori
    assert meta["n_tags"] == 10


def test_tiff_orientation_defaults_and_validation():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    _, meta = decode_tiff(encode_tiff(px), return_meta=True)
    assert meta["orientation"] == 1  # TIFF default: row 0 = top
    assert meta["n_tags"] == 9
    with pytest.raises(ValueError, match="orientation"):
        encode_tiff(px, orientation=5)


def test_tiff_orientation_tag_order_ascending():
    """TIFF 6.0 requires IFD entries sorted by tag id; the orientation
    entry (274) must land between StripOffsets (273) and SamplesPerPixel
    (277)."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_tiff(px, orientation=6)
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    tags = [struct.unpack_from("<H", blob, ifd_off + 2 + i * 12)[0] for i in range(n)]
    assert tags == sorted(tags)
    assert 274 in tags


def test_gif_animation_rejects_unsupported_real_world_shapes():
    """r9 review: transparency and sub-rectangle (inter-frame-optimized)
    GIFs must raise loudly, never decode misaligned crops; RGB frames get
    the explicit index-matrix message."""
    pal = _pal()
    frames = [np.zeros((3, 4), dtype=np.uint8)] * 2
    blob = bytearray(encode_gif_animation(frames, pal, [1, 2]))
    with pytest.raises(ValueError, match="index matri"):
        encode_gif_animation([np.zeros((3, 4, 3), dtype=np.uint8)], pal, [1])
    i = bytes(blob).index(b"\x21\xf9\x04")
    t = bytearray(blob)
    t[i + 3] |= 0x01  # transparency flag in the first GCE
    with pytest.raises(ValueError, match="transparency"):
        decode_gif_animation(bytes(t))
    s = bytearray(blob)
    j = s.index(0x2C, 6)
    struct.pack_into("<H", s, j + 1, 2)  # first frame left=2
    with pytest.raises(ValueError, match="sub-rectangle"):
        decode_gif_animation(bytes(s))


def test_tiff_optional_unreadable_tag_defaults_required_bits_raises():
    """r9 review: an OPTIONAL tag (Orientation) whose type the walk cannot
    read is treated as absent (default wins — the ADVICE-r8 contract),
    while BitsPerSample, which changes buffer interpretation, raises an
    accurate unsupported-type error instead of assuming 8-bit."""
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    blob = encode_tiff(px, rows_per_strip=4, orientation=6)
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)

    def retype(tag_id: int, new_type: int) -> bytes:
        raw = bytearray(blob)
        for i in range(n):
            base = ifd_off + 2 + i * 12
            tag, _ = struct.unpack_from("<HH", raw, base)
            if tag == tag_id:
                struct.pack_into("<H", raw, base + 2, new_type)
        return bytes(raw)

    out, meta = decode_tiff(retype(274, 1), return_meta=True)  # BYTE
    assert (out == px).all()
    assert meta["orientation"] == 1  # unreadable optional -> TIFF default
    with pytest.raises(ValueError, match="BitsPerSample.*type 5"):
        decode_tiff(retype(258, 5))  # RATIONAL


def test_timestamptz_oracle_column_fails_typed_gate():
    """r9 review: duckdb TIMESTAMPTZ materializes tz-AWARE datetimes while
    Spark collects naive ones — the typed gate must flag it (the HUGEINT
    class, timestamp edition)."""
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.testing import type_mismatches

    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    assert type_mismatches(schema, ["ts"], ["TIMESTAMP WITH TIME ZONE"])
    assert not type_mismatches(schema, ["ts"], ["TIMESTAMP"])


# ------------------------------------------------ nested-set closed form


def test_nested_set_closed_form_matches_real_dfs():
    """hier_nested_set derives lft/rgt WITHOUT a DFS walk from
    lft = 2·pre − 1 − depth, rgt = lft + 2·size − 1. Replay an actual
    DFS entry/exit counter over the same tree (parent(k) = k // 10,
    siblings in path-string order — the qid's preorder) and require
    bit-equality on every node."""
    keys = list(range(1, 347))
    children: dict[int, list[int]] = {}
    for k in keys:
        if k >= 10:
            children.setdefault(k // 10, []).append(k)
    roots = sorted((k for k in keys if k < 10), key=str)
    for v in children.values():
        v.sort(key=str)

    lft, rgt, pre, depth, size = {}, {}, {}, {}, {}
    counter = [0]
    preorder = [0]

    def dfs(v: int, d: int) -> int:
        counter[0] += 1
        preorder[0] += 1
        lft[v], pre[v], depth[v] = counter[0], preorder[0], d
        sz = 1
        for c in children.get(v, []):
            sz += dfs(c, d + 1)
        counter[0] += 1
        rgt[v] = counter[0]
        size[v] = sz
        return sz

    for r in roots:
        dfs(r, 0)

    for v in keys:
        assert lft[v] == 2 * pre[v] - 1 - depth[v], v
        assert rgt[v] == lft[v] + 2 * size[v] - 1, v
    # and the labels are a valid nested-set: child interval strictly inside
    for k in keys:
        if k >= 10:
            p = k // 10
            assert lft[p] < lft[k] and rgt[k] < rgt[p]


def test_zcr_strict_sign_change_ignores_zero_samples():
    """The crossing test is s_i·s_{i−1} < 0: a zero sample breaks a
    crossing (…,+,0,−,… counts 0), exactly what the SQL CASE computes."""
    import numpy as np

    d = np.array([3, -2, 0, -5, 4, 0, 0, 1], dtype=np.int64)
    zcr = int(((d[1:] * d[:-1]) < 0).sum())
    assert zcr == 2  # 3→-2 and -5→4 only


def test_isqrt_expression_exact_on_boundaries(tmp_path):
    """The float-seeded integer sqrt (wl_eoq_reorder) must equal
    math.isqrt on perfect squares, squares±1, and values where the double
    sqrt rounds across the integer — checked in Spark AND DuckDB with the
    SAME expression string."""
    import math

    import duckdb

    from hdc_dataengineering_sqlsync_spark.plans.roundnine_i import _ISQRT

    vals = []
    for s in [1, 2, 3, 10, 99, 12345, 2**20 - 1, 3037000]:
        for a in (s * s - 1, s * s, s * s + 1):
            if a >= 0:
                vals.append(a)
    vals += [0, 1, 2, (1 << 52) - 1]
    expr = _ISQRT.format(a="a")
    got = duckdb.sql(
        f"SELECT a, {expr.replace('DIV', '//')} AS s FROM "
        f"(SELECT unnest({vals}) AS a)"
    ).fetchall()
    for a, s in got:
        assert s == math.isqrt(a), (a, s)


def test_sweepline_level_matches_brute_force_stabbing():
    """wl_peak_open_orders' +1/−1 prefix sum must equal, on every delta
    day, the brute-force count of intervals containing that day
    (inclusive both ends) — and all deltas must telescope to zero."""
    import numpy as np

    rng = np.random.default_rng(7)
    d0 = rng.integers(0, 200, 80)
    d1 = d0 + rng.integers(0, 60, 80)
    deltas: dict[int, int] = {}
    for a, b in zip(d0, d1):
        deltas[int(a)] = deltas.get(int(a), 0) + 1
        deltas[int(b) + 1] = deltas.get(int(b) + 1, 0) - 1
    assert sum(deltas.values()) == 0
    lvl = 0
    for day in sorted(deltas):
        lvl += deltas[day]
        brute = int(((d0 <= day) & (day <= d1)).sum())
        assert lvl == brute, day


def test_tiered_fee_brackets_partition_and_marginal_rates():
    """wl_tiered_fee_schedule bracket algebra: t1+t2+t3 == spend for any
    spend, the fee is monotone non-decreasing, and each marginal dollar
    is charged at its own bracket's rate (progressive, not cliff)."""
    T1, T2 = 100_000_000, 250_000_000

    def fee(cents: int) -> int:
        t1 = min(cents, T1)
        t2 = min(max(cents - T1, 0), T2 - T1)
        t3 = max(cents - T2, 0)
        assert t1 + t2 + t3 == cents
        return (t1 * 50 + t2 * 125 + t3 * 200) // 10000

    prev = -1
    for c in [0, 1, T1 - 1, T1, T1 + 1, T2 - 1, T2, T2 + 1, 10 * T2]:
        f = fee(c)
        assert f >= prev
        prev = f
    # marginal rate inside each bracket (scaled ×10000 to dodge rounding)
    assert fee(10_000 * 10000) - fee(0) == 10_000 * 50
    assert fee(T1 + 10_000 * 10000) - fee(T1) == 10_000 * 125
    assert fee(T2 + 10_000 * 10000) - fee(T2) == 10_000 * 200


def test_duckdb_decimal_floordiv_degrades_to_double():
    """Pin the r9 hazard class the sweep now flags: DuckDB '//' on DECIMAL
    operands is DOUBLE division (33316.71…), and CAST(... AS BIGINT)
    ROUNDS it (33317) — while on HUGEINT '//' is true integral division
    (33316), matching Spark's DIV. text_simpson_diversity shipped the
    DECIMAL form and diverged by exactly +1; the oracle must anchor."""
    import duckdb

    rep, nn = 56522000000, 1696506
    dec = duckdb.sql(
        f"SELECT CAST(CAST({rep} AS DECIMAL(38,0))"
        f" // CAST({nn} AS DECIMAL(38,0)) AS BIGINT)"
    ).fetchone()[0]
    hug = duckdb.sql(
        f"SELECT CAST(CAST({rep} AS HUGEINT) // CAST({nn} AS HUGEINT)"
        f" AS BIGINT)"
    ).fetchone()[0]
    assert dec == 33317  # the trap: double div + rounding cast
    assert hug == 33316 == rep // nn  # the anchor the oracles use


def test_hazard_sweep_flags_decimal_floordiv_sites():
    from scripts.oracle_hazard_sweep import _decimal_floordiv_sites

    bad = """
    WITH s AS (SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS rep FROM t)
    SELECT CAST(rep * 10 // 3 AS BIGINT) FROM s
    """
    good = """
    WITH s AS (SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS rep FROM t)
    SELECT CAST(CAST(rep AS HUGEINT) * 10 // 3 AS BIGINT) FROM s
    """
    assert _decimal_floordiv_sites(bad)
    assert not _decimal_floordiv_sites(good)


def test_knuth_multiplier_is_bijection_mod_2_32():
    """mix_curriculum_stages' first_doc relies on h = doc_id·2654435761
    mod 2^32 being collision-free: the multiplier is odd, hence
    invertible mod 2^32. Verify injectivity on a dense id block and
    compute the actual inverse as the certificate."""
    mult, mod = 2654435761, 1 << 32
    inv = pow(mult, -1, mod)
    assert (mult * inv) % mod == 1
    ids = range(100_000)
    seen = {(i * mult) % mod for i in ids}
    assert len(seen) == 100_000


def test_hash_chain_detects_reorder_insert_delete():
    """sync_hash_chain_audit's tamper-evidence: the chain digest changes
    under reorder, insertion, and deletion — and matches the
    applyInPandas implementation's algebra."""
    import hashlib

    import pandas as pd

    from hdc_dataengineering_sqlsync_spark.plans.roundnine_at import (
        _chain_group,
    )

    def chain(keys):
        h = None
        for k in keys:
            h = hashlib.md5(
                (f"genesis|{k}" if h is None else f"{h}|{k}").encode()
            ).hexdigest()
        return h

    base = [3, 1, 7, 5]
    ordered = sorted(base)
    pdf = pd.DataFrame({"mon": ["m"] * 4, "k": base})
    out = _chain_group(pdf).iloc[0]
    assert out["chain_digest"] == chain(ordered)  # impl sorts by key
    assert out["n_records"] == 4
    assert chain(ordered) != chain(list(reversed(ordered)))  # reorder
    assert chain(ordered) != chain(ordered + [9])  # insert
    assert chain(ordered) != chain(ordered[:-1])  # delete


def test_retail_445_calendar_properties():
    """fn_retail_calendar_445: every 52-week year has 12 periods of
    exactly 4/4/5 weeks per quarter-third, and period membership is a
    pure function of weeks-since-anchor."""
    def period(wk):
        wiy = wk % 52
        return ((wiy % 13 < 4) and 1 or (wiy % 13 < 8) and 2 or 3) + (
            wiy // 13
        ) * 3

    from collections import Counter

    weeks_per_period = Counter(period(wk) for wk in range(52))
    assert sorted(weeks_per_period) == list(range(1, 13))
    for p, n in weeks_per_period.items():
        assert n == (5 if p % 3 == 0 else 4), (p, n)
    assert period(52) == period(0)  # next fiscal year restarts


def test_mix_rate_effects_reconcile_to_total_change():
    """wl_mix_rate_decomposition: the sequential decomposition's terms
    (Δshare·r0 + s1·Δrate) sum across segments to the total rate change
    (exactly, in real arithmetic — the e6 grid adds only per-term
    quantization the oracle shares)."""
    segs = [  # (n0, r0_events, n1, r1_events)
        (100, 10, 300, 45),
        (200, 50, 150, 30),
        (300, 30, 250, 40),
    ]
    n0t = sum(s[0] for s in segs)
    n1t = sum(s[2] for s in segs)
    rate0 = sum(s[1] for s in segs) / n0t
    rate1 = sum(s[3] for s in segs) / n1t
    total = 0.0
    for n0, r0, n1, r1 in segs:
        s0, s1 = n0 / n0t, n1 / n1t
        rr0, rr1 = r0 / n0, r1 / n1
        total += (s1 - s0) * rr0 + s1 * (rr1 - rr0)
    assert abs(total - (rate1 - rate0)) < 1e-12


def test_sprt_integer_walk_matches_textbook_llr():
    """wl_sprt_sequential_test: with symmetric p0/p1 the per-trial LLR
    collapses to ±ln(p1/p0); verify the integer-walk formulation equals
    the textbook sum s·ln(p1/p0) + f·ln(q1/q0) (q-terms are the exact
    negatives) and that the embedded e6 constants are what math.log
    gives."""
    import math

    from hdc_dataengineering_sqlsync_spark.plans.roundnine_af import (
        _LLR_E6,
        _THRESH_E6,
    )

    assert _LLR_E6 == int(math.floor(math.log(52 / 48) * 1e6 + 0.5))
    assert _THRESH_E6 == int(math.floor(math.log(19.0) * 1e6 + 0.5))
    p0, p1 = 0.48, 0.52
    for s, f in [(10, 3), (0, 7), (100, 100), (55, 41)]:
        textbook = s * math.log(p1 / p0) + f * math.log(
            (1 - p1) / (1 - p0)
        )
        walk = (s - f) * math.log(p1 / p0)
        assert abs(textbook - walk) < 1e-9


def test_rich_club_census_matches_brute_force():
    """graph_rich_club algebra on a hand graph: star K1,4 plus a
    triangle among three hubs — phi at k where only the triangle
    qualifies must be 10000 bps (complete), and at k=0 the whole
    (sparse) graph dilutes it."""
    und = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7), (5, 7),
           (0, 5), (0, 6), (0, 7)]
    edges = und + [(b, a) for a, b in und]
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1

    def phi(k):
        rich = {v for v, d in deg.items() if d > k}
        e = sum(1 for a, b in edges if a in rich and b in rich)
        n = len(rich)
        return (e * 10000) // (n * (n - 1)) if n > 1 else 0

    assert phi(2) == 10000  # hubs 0,5,6,7 (deg>2): complete subgraph
    assert phi(0) < 10000  # leaves dilute the density


def test_composed_isqrt_fourth_root_accuracy_and_determinism():
    """wl_cagr_fourth_root: isqrt(isqrt(r·1e12)·100) must be within one
    e-4 unit of the true fourth root ·1e4 across a ratio sweep, exact
    on perfect fourth powers of the grid, and (trivially) deterministic
    — pure integer pipeline."""
    import math

    for num, den in [(1, 1), (3, 2), (2, 1), (31, 17), (1, 3), (997, 503)]:
        r_e12 = num * 10**12 // den
        got = math.isqrt(math.isqrt(r_e12) * 100)
        true = (num / den) ** 0.25 * 10**4
        assert abs(got - true) <= 1.000001, (num, den, got, true)
    assert math.isqrt(math.isqrt(10**12) * 100) == 10**4  # ratio 1 exact
    # exact fourth power: (1.2)^4 = 2.0736 -> root 1.2 -> 12000
    assert math.isqrt(math.isqrt(20736 * 10**8) * 100) == 12000


def test_serpentine_deal_balances_tighter_than_round_robin():
    """sync_snake_shard_balance: on a strictly decreasing size sequence,
    the boustrophedon deal's max-min shard gap must not exceed
    round-robin's (and is strictly tighter here); every shard gets the
    same number of parts when n_parts % n_shards == 0."""
    sizes = sorted((100 - i for i in range(32)), reverse=True)
    N = 8

    def deal(serpentine: bool):
        shards = [0] * N
        counts = [0] * N
        for r, sz in enumerate(sizes):
            pos = r % N
            s = (N - 1 - pos) if (serpentine and (r // N) % 2 == 1) else pos
            shards[s] += sz
            counts[s] += 1
        return shards, counts

    snake, cs = deal(True)
    rr, cr = deal(False)
    assert cs == [4] * N and cr == [4] * N
    assert max(snake) - min(snake) < max(rr) - min(rr)
    assert max(snake) - min(snake) <= N  # one size-band's spread


def test_theil_moment_formula_matches_direct_definition():
    """wl_theil_inequality's T = Σx·lnx/X − ln(X/n) equals the textbook
    Σ(x/X)ln(x/μ) — and is 0 on equal values, positive on skewed."""
    import math

    def theil(xs):
        X = sum(xs)
        n = len(xs)
        mu = X / n
        direct = sum(x / X * math.log(x / mu) for x in xs)
        moment = sum(x * math.log(x) for x in xs) / X - math.log(mu)
        assert abs(direct - moment) < 1e-12
        return direct

    assert abs(theil([5, 5, 5, 5])) < 1e-12
    assert theil([1, 1, 1, 97]) > 0.5


def test_gini_split_fixed_point_cost_ranks_like_float_gini():
    """wl_gini_split_stump's e9 fixed-point cost must pick the same
    argmin threshold as the textbook float weighted Gini on a fixture
    with a clearly best split (and the fixed-point value must be within
    1 ulp-of-grid of the float cost × 1e9)."""
    cells = [  # (q, n, pos)
        (1, 100, 5),
        (2, 80, 10),
        (3, 120, 90),
        (4, 60, 55),
        (5, 40, 38),
    ]
    nt = sum(n for _, n, _ in cells)
    post = sum(p for _, _, p in cells)

    def fixed(nl, posl):
        nr, posr = nt - nl, post - posl
        a = (nl * nl - posl * posl - (nl - posl) ** 2) * 10**9 // nl
        b = (nr * nr - posr * posr - (nr - posr) ** 2) * 10**9 // nr
        return a + b

    def floaty(nl, posl):
        nr, posr = nt - nl, post - posl
        gl = 1 - (posl / nl) ** 2 - ((nl - posl) / nl) ** 2
        gr = 1 - (posr / nr) ** 2 - ((nr - posr) / nr) ** 2
        return nl * gl + nr * gr

    nl = posl = 0
    fixed_costs, float_costs = {}, {}
    for q, n, p in cells[:-1]:
        nl += n
        posl += p
        fixed_costs[q] = fixed(nl, posl)
        float_costs[q] = floaty(nl, posl)
        assert abs(fixed_costs[q] - float_costs[q] * 1e9) < 2000
    assert min(fixed_costs, key=lambda q: (fixed_costs[q], q)) == min(
        float_costs, key=lambda q: (float_costs[q], q)
    ) == 2  # splitting after q=2 isolates the low-return mass


def test_kruskal_wallis_doubled_ranks_match_scipy_free_reference():
    """Doubled-rank H (wl_kruskal_wallis algebra) vs a from-scratch
    average-rank implementation on a tied fixture."""
    groups = {"a": [10, 20, 20, 30], "b": [20, 40, 40], "c": [50, 60, 10]}
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # reference: average ranks with ties
    import collections

    cnt = collections.Counter(allv)
    first = {}
    i = 1
    for v in sorted(cnt):
        first[v] = i
        i += cnt[v]
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    h_ref = 12 / (n * (n + 1)) * sum(
        sum(avg_rank[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    # doubled-rank integer path
    cum_before = {v: first[v] - 1 for v in cnt}
    ssum = 0
    for vs in groups.values():
        s2 = sum(2 * cum_before[v] + cnt[v] + 1 for v in vs)
        ssum += s2 * s2 / len(vs)
    h_int = 3.0 * ssum / (n * (n + 1)) - 3.0 * (n + 1)
    assert abs(h_ref - h_int) < 1e-9


def test_dso_countback_set_formulation_matches_sequential_walk():
    """wl_dso_countback computes the countback with a descending
    cumulative sum + conditional aggregation; replay the textbook
    sequential walk (consume whole months backward, pro-rate the first
    that doesn't fit) and require identical milli-days on fixtures
    covering zero AR, exact-fit, mid-month, and all-history-exhausted."""
    def set_based(ar, months):  # months: list of (dim, billings), newest first
        cum = full_days = covered = 0
        frac = None
        for dim, b in months:
            cum += b
            if cum <= ar:
                full_days += dim
                covered += b
            elif cum - b <= ar and frac is None:
                frac = (ar - covered) * dim * 1000 // b
        return full_days * 1000 + (frac or 0)

    def sequential(ar, months):
        days = 0
        rem = ar
        for dim, b in months:
            if rem >= b:
                rem -= b
                days += dim * 1000
            else:
                days += rem * dim * 1000 // b
                rem = 0
                break
        return days

    cases = [
        (0, [(31, 100), (30, 200)]),
        (100, [(31, 100), (30, 200)]),          # exact fit, month 1
        (150, [(31, 100), (30, 200)]),          # mid-month 2
        (299, [(31, 100), (30, 200)]),
        (300, [(31, 100), (30, 200)]),          # exact fit, all history
        (999, [(31, 100), (30, 200)]),          # AR exceeds history
        (73, [(28, 97), (31, 211), (30, 50)]),
    ]
    for ar, months in cases:
        assert set_based(ar, months) == sequential(ar, months), (ar, months)


def test_holt_winters_recursion_matches_reference_loop():
    """Pin the HW-additive update algebra (level/trend/season in exact
    tenths, trunc division, rotating 4-slot register) against a plain
    reference loop on a hand-made seasonal series."""
    import pandas as pd

    from hdc_dataengineering_sqlsync_spark.plans.roundnine_t import _hw_group

    xs = [100, 140, 90, 60, 110, 150, 95, 65, 120, 160]
    pdf = pd.DataFrame(
        {"flag": ["A"] * len(xs), "qt": list(range(len(xs))), "x": xs}
    )
    out = _hw_group(pdf).iloc[0]

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    lvl, trend, season = xs[0], 0, [0, 0, 0, 0]
    for x in xs[1:]:
        ln = tdiv(2 * (x - season[0]) + 8 * (lvl + trend), 10)
        trend = tdiv((ln - lvl) + 9 * trend, 10)
        season = season[1:] + [tdiv(3 * (x - ln) + 7 * season[0], 10)]
        lvl = ln
    assert out["level_cents"] == lvl
    assert out["trend_cents"] == trend
    assert out["season_next_cents"] == season[0]
    assert out["forecast_next_cents"] == lvl + trend + season[0]


def test_min_label_propagation_superstep_semantics():
    """3 synchronous min-label supersteps on a path graph a-b-c-d-e:
    labels travel exactly k hops per superstep — after 3 rounds node e
    (distance 4 from a) has NOT yet received a's label; components
    would need one more round. The partial state IS the contract."""
    edges = [(i, i + 1) for i in range(4)]
    edges += [(b, a) for a, b in edges]
    labels = {v: v for v in range(5)}
    for _ in range(3):
        new = {}
        for v in labels:
            nbrs = [labels[u] for u, w in edges if w == v]
            new[v] = min([v] + nbrs)
        labels = new
    assert labels[3] == 0  # 3 hops: arrived
    assert labels[4] == 1  # 4 hops: not yet


def test_croston_recursion_matches_reference_loop():
    """Pin the Croston update algebra (z/q smoothed only on demand days,
    trunc division) against a straightforward reference implementation
    on a hand-made sparse series."""
    import pandas as pd

    from hdc_dataengineering_sqlsync_spark.plans.roundnine_p import _croston_group

    days = [3, 5, 10, 11, 20]
    qtys = [7, 12, 3, 9, 30]
    pdf = pd.DataFrame({"brand": ["B"] * 5, "day_ix": days, "qty": qtys})
    out = _croston_group(pdf).iloc[0]
    # reference: z0=7, q0=3 then (2x+8z)//10 , (2g+8q)//10
    z, q, prev = 7, 3, 3
    for d, x in zip(days[1:], qtys[1:]):
        g = d - prev
        z = (2 * x + 8 * z) // 10
        q = (2 * g + 8 * q) // 10
        prev = d
    assert out["size_units"] == z and out["interval_days"] == q
    assert out["rate_milliunits_per_day"] == z * 1000 // q
    assert out["n_demands"] == 5
