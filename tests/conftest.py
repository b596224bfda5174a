from __future__ import annotations

import pytest

from sensor_data_pipeline___spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


# The reference's golden 4-line sample (tests/conftest.py:10-18,
# scripts/test_all.sh:163-167) — all on 2022-04-14 UTC.
GOLDEN_LINES = [
    "1649941817 Voltage 1.34",
    "1649941818 Voltage 1.35",
    "1649941817 Current 12.0",
    "1649941818 Current 14.0",
]

# Invalid-at-ingest corpus (reference tests/conftest.py:22-34,
# tests/unit/test_parsing.py:54-99) — any one of these rejects a batch.
INVALID_LINES = [
    "1649941817 Voltage",
    "1649941817",
    "Voltage 1.34",
    "-123 Voltage 1.34",
    "1649941817.5 Voltage 1.34",
    "1649941817 123Voltage 1.34",
    "1649941817 _Voltage 1.34",
    "1649941817 Voltage abc",
    "1649941817 Voltage 1.34 x",
    "notanumber Voltage 1.34",
]

# Valid at ingest gate, silently dropped at silver (SURVEY.md §2.9).
DIVERGENCE_LINES = [
    "1649941817  Voltage 1.34",  # double space
    "1649941817\tVoltage\t1.34",  # tabs
    "1649941817 Voltage 1e3",  # sci-notation
    "1649941817 Voltage .5",  # leading dot
]
