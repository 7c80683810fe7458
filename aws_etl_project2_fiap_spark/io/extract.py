"""Driver-side extraction edge (S1/S2/S3): paginated/point fetch →
DataFrame.

Browser automation and REST polling have no distributed analog — the
reference runs them on one process (Selenium page loop,
src/etl.py:97-149; CoinGecko GET, src/bitoin_coin_gecko_api.py:34-44)
and so do we: a *provider* callable yields one pandas frame per page,
the engine unions them Arrow-batched into one DataFrame and hands off to
the distributed plan. At 100 TB the provider's job is only to land raw
bytes; everything after ``extract_pages`` is cluster-side.

The network/browser calls themselves are injected (tests pass fakes; a
real deployment passes a requests/selenium-backed provider) — the
engine's surface is the iteration + union + schema contract.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PageProvider = Callable[[int], "object | None"]  # page index → pandas.DataFrame | None


def extract_pages(
    spark: SparkSession,
    provider: PageProvider,
    max_pages: int,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S1: paginated extract ≙ the Selenium click-next loop.

    Calls ``provider(0..max_pages-1)`` until exhaustion (``None`` ends
    early, like the reference's pagination-next probe), concatenates the
    page frames, and creates ONE DataFrame via a single Arrow transfer —
    not one ``createDataFrame`` per page (U1's union happens in pandas,
    where page frames are tiny).
    """
    import pandas as pd

    pages = []
    for i in range(max_pages):
        pdf = provider(i)
        if pdf is None:
            break
        pages.append(pdf)
    if not pages:
        if schema is None:
            raise ValueError("no pages extracted and no schema to shape an empty frame")
        return spark.createDataFrame([], schema)
    merged = pd.concat(pages, ignore_index=True)
    return (
        spark.createDataFrame(merged, schema)
        if schema is not None
        else spark.createDataFrame(merged)
    )


def extract_point(
    spark: SparkSession,
    fetch: Callable[[], dict],
    schema: T.StructType,
) -> DataFrame:
    """S2/S3: point fetch (one API response) → single-row DataFrame with
    an explicit schema — never inferred, the row is too small to trust."""
    return spark.createDataFrame([fetch()], schema)


def extract_records(
    spark: SparkSession,
    records: Iterable[dict],
    schema: T.StructType,
) -> DataFrame:
    """Bounded record batch (e.g. a drained queue) → DataFrame."""
    return spark.createDataFrame(list(records), schema)
