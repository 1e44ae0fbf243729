"""Round-5 seventh-session batch-O differentials: the Q9-style brand
revenue chain vs a pandas merge chain, and the dow×hour profile vs
direct calendar arithmetic (epoch anchored on a known Thursday)."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


_DAY = 86_400_000_000
_HOUR = 3_600_000_000


# ---------------------------------------------------------- profit by brand
def test_profit_by_brand_matches_merge_chain(ray_session, tmp_path):
    rng = np.random.RandomState(12)
    n_parts, n_supp, n_li = 20, 6, 400
    part = pd.DataFrame({
        "p_partkey": np.arange(n_parts, dtype="int64"),
        "p_name": "p", "p_brand": [f"B{i % 3}" for i in range(n_parts)],
        "p_type": "t", "p_size": np.int32(1), "p_retailprice": 1.0})
    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype="int64"),
        "s_name": "s",
        "s_nationkey": np.array([0, 0, 1, 1, 2, 2], dtype="int32"),
        "s_acctbal": 0.0})
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["ALPHA", "BETA", "GAMMA"],
        "n_regionkey": np.int32(0)})
    li = pd.DataFrame({
        "l_orderkey": np.arange(n_li, dtype="int64"),
        "l_partkey": rng.randint(0, n_parts, n_li).astype("int64"),
        "l_suppkey": rng.randint(0, n_supp, n_li).astype("int64"),
        "l_linenumber": np.int32(1),
        "l_quantity": 1.0,
        "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
        "l_discount": np.round(rng.choice([0.0, 0.05, 0.1], n_li), 2),
        "l_tax": 0.0, "l_returnflag": "A", "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("2024-01-01")})
    sf = _write(tmp_path, part=part, supplier=supp, nation=nation,
                lineitem=li)

    from bb_ocr_ray.pipelines.queries import q_profit_by_brand
    got = q_profit_by_brand(sf)

    m = (li.merge(part[["p_partkey", "p_brand"]],
                  left_on="l_partkey", right_on="p_partkey")
         .merge(supp[["s_suppkey", "s_nationkey"]],
                left_on="l_suppkey", right_on="s_suppkey")
         .merge(nation[["n_nationkey", "n_name"]],
                left_on="s_nationkey", right_on="n_nationkey"))
    m["rev_c"] = (np.round(m["l_extendedprice"] * 100).astype("int64")
                  * (100 - np.round(m["l_discount"] * 100)
                     .astype("int64")))
    want = (m.groupby(["n_name", "p_brand"])
            .agg(n_items=("rev_c", "size"), rev_c=("rev_c", "sum"))
            .reset_index())
    want["revenue"] = (want["rev_c"] / 10_000.0).round(2)
    want = want.sort_values(["n_name", "p_brand"]).reset_index(drop=True)
    assert list(got["n_name"]) == list(want["n_name"])
    assert list(got["p_brand"]) == list(want["p_brand"])
    assert list(got["n_items"]) == list(want["n_items"])
    assert np.allclose(got["revenue"], want["revenue"])


# --------------------------------------------------------------- dow profile
def test_dow_profile_epoch_anchor(ray_session, tmp_path):
    # epoch day 0 = Thursday 1970-01-01 -> dow (0+4)%7 == 4
    ts = ([h * _HOUR for h in (0, 0, 5)]            # Thu hours 0,0,5
          + [4 * _DAY + 12 * _HOUR]                 # Monday (day 4) noon
          + [11 * _DAY + 12 * _HOUR] * 3)           # next Monday noon x3
    ev = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype="int64"),
        "ts": pd.to_datetime(np.array(ts, dtype="int64"), unit="us"),
        "user_id": np.int64(0), "event_type": "view",
        "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_dow_profile
    got = q_dow_profile(sf).set_index(["dow", "hod"])

    assert pd.Timestamp("1970-01-01").dayofweek == 3  # pandas Mon=0: Thu
    # our convention: (day+4)%7, so Thursday=4, Monday=(4+4)%7=1
    assert int(got.loc[(4, 0), "n"]) == 2
    assert int(got.loc[(4, 5), "n"]) == 1
    # two distinct Mondays -> n_days=2; noon cell has 4 events, avg 2.0
    assert int(got.loc[(1, 12), "n"]) == 4
    assert int(got.loc[(1, 12), "n_days"]) == 2
    assert abs(got.loc[(1, 12), "avg_events"] - 2.0) < 1e-9
    # Thursday spans one date -> n_days=1
    assert int(got.loc[(4, 0), "n_days"]) == 1
