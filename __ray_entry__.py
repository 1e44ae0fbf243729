"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code it calls) calls ray.init()/ray.shutdown().

``entry()``    — flagship extraction pipeline at sf0.001.
``queries()``  — one callable per implemented operator/pipeline
                 (bb_ocr_ray.pipelines.queries.QUERIES).
``oracle_sql()`` — DuckDB-equivalent SQL per SQL-expressible query
                 (bb_ocr_ray.pipelines.oracles.ORACLES).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize
    Common-Crawl-style pages from the documents table, extract
    main-content text (DOM segmentation + boilerplate classification +
    reading-order emission). Returns the extracted Dataset."""
    from bb_ocr_ray.pipelines.extract_pipeline import extract_from_sf_dir

    return extract_from_sf_dir("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from bb_ocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bb_ocr_ray.pipelines.oracles import ORACLES

    return dict(ORACLES)
