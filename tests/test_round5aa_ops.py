"""Round-5 seventh-session batch-S differentials: basket sizes vs a
Counter walk, and user lifespan vs per-user min/max day arithmetic."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


_DAY = 86_400_000_000


def test_order_sizes_matches_counter(ray_session, tmp_path):
    rng = np.random.RandomState(23)
    orders = np.repeat(np.arange(200, dtype="int64"),
                       rng.randint(1, 8, size=200))
    li = pd.DataFrame({
        "l_orderkey": orders,
        "l_partkey": np.int64(1), "l_suppkey": np.int64(1),
        "l_linenumber": np.int32(1), "l_quantity": 1.0,
        "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": "A", "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("2024-01-01")})
    sf = _write(tmp_path, lineitem=li)

    from bb_ocr_ray.pipelines.queries import q_order_sizes
    got = q_order_sizes(sf)

    from collections import Counter
    sizes = Counter(Counter(orders).values())
    assert dict(zip(got["basket_size"], got["n_orders"])) == dict(sizes)
    assert int(got["n_orders"].sum()) == 200


def test_user_lifespan_matches_min_max(ray_session, tmp_path):
    rows = [(0, 0), (0, 9 * _DAY),            # lifespan 9
            (1, 3 * _DAY),                    # single day -> 0
            (2, _DAY), (2, _DAY + 5), (2, 4 * _DAY)]  # 3
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
        "user_id": np.array([r[0] for r in rows], dtype="int64"),
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_user_lifespan
    got = q_user_lifespan(sf)

    assert dict(zip(got["lifespan_days"], got["n_users"])) == \
        {0: 1, 3: 1, 9: 1}
