"""Core validation/conversion operator tests (reference parity: SURVEY.md §2.2, §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray import (
    TemporalDataset,
    TimeColumnError,
    convert_column_to_datetime_type,
    convert_time_column_to_numeric,
    count_dataset_column_nulls,
    is_dataset_empty,
    sort_dataset_time,
    validate_column_numeric_or_datetime,
    validate_feature_columns_numeric,
    validate_temporal_ordering,
)


def ds_from(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df)


def make_df(n=10, numeric_time=False):
    time = np.arange(n, dtype=np.float64) if numeric_time else pd.date_range("2023-01-01", periods=n)
    return pd.DataFrame({"time": time, "target": np.linspace(0, 1, n), "feature_1": np.arange(n, dtype=float)})


# -- emptiness (M7)
def test_is_dataset_empty():
    assert is_dataset_empty(ds_from(pd.DataFrame({"a": []}))) is True
    assert is_dataset_empty(ds_from(make_df())) is False
    with pytest.raises(ValueError, match="DataFrame cannot be None."):
        is_dataset_empty(None)


# -- null counts (A1)
def test_count_nulls():
    df = make_df(10)
    df.loc[2:4, "feature_1"] = None
    counts = count_dataset_column_nulls(ds_from(df), ["target", "feature_1"])
    assert counts == {"target": 0, "feature_1": 3}


def test_count_nulls_missing_column():
    with pytest.raises(ValueError, match="Column 'nope' not found"):
        count_dataset_column_nulls(ds_from(make_df()), ["nope"])


# -- type gates (M4/M5)
def test_validate_numeric_or_datetime():
    validate_column_numeric_or_datetime(ds_from(make_df()), "time")
    validate_column_numeric_or_datetime(ds_from(make_df(numeric_time=True)), "time")
    df = make_df()
    df["time"] = df["time"].astype(str)
    with pytest.raises(ValueError, match="neither numeric nor datetime"):
        validate_column_numeric_or_datetime(ds_from(df), "time")
    with pytest.raises(ValueError, match="Column 'nope' does not exist"):
        validate_column_numeric_or_datetime(ds_from(make_df()), "nope")


def test_validate_features_numeric():
    validate_feature_columns_numeric(ds_from(make_df()), time_col="time")
    df = make_df()
    df["bad"] = "x"
    with pytest.raises(ValueError, match="Column 'bad' must be numeric"):
        validate_feature_columns_numeric(ds_from(df), time_col="time")


# -- conversions (M1-M3)
def test_convert_time_to_numeric_us():
    out = convert_time_column_to_numeric(ds_from(make_df(3)), "time", "us").to_pandas()
    assert out["time"].dtype == np.float64
    assert out["time"].iloc[1] - out["time"].iloc[0] == 86_400_000_000.0


def test_convert_time_to_numeric_ns_is_int64():
    out = convert_time_column_to_numeric(ds_from(make_df(3)), "time", "ns").to_pandas()
    assert out["time"].dtype == np.int64


def test_convert_numeric_passthrough():
    df = make_df(3, numeric_time=True)
    out = convert_time_column_to_numeric(ds_from(df), "time").to_pandas()
    assert list(out["time"]) == [0.0, 1.0, 2.0]


def test_convert_to_datetime_from_string():
    df = pd.DataFrame({"time": ["2023-01-01", "2023-01-02"], "v": [1.0, 2.0]})
    out = convert_column_to_datetime_type(ds_from(df), "time").to_pandas()
    assert pd.api.types.is_datetime64_any_dtype(out["time"])


def test_convert_to_datetime_rejects_bool():
    df = pd.DataFrame({"time": [True, False], "v": [1.0, 2.0]})
    with pytest.raises(TimeColumnError, match="boolean type and cannot be converted"):
        convert_column_to_datetime_type(ds_from(df), "time")


# -- sort (O1)
def test_sort_dataset_time():
    df = pd.DataFrame({"time": [3.0, 1.0, 2.0], "target": [30.0, 10.0, 20.0]})
    out = sort_dataset_time(ds_from(df), "time").to_pandas()
    assert list(out["time"]) == [1.0, 2.0, 3.0]
    out_desc = sort_dataset_time(ds_from(df), "time", ascending=False).to_pandas()
    assert list(out_desc["time"]) == [3.0, 2.0, 1.0]


# -- temporal ordering (L4 / A3-A6)
def test_duplicate_global():
    df = pd.DataFrame({"time": [1.0, 2.0, 2.0], "v": [1.0, 2.0, 3.0]})
    with pytest.raises(TimeColumnError, match="Duplicate timestamps found in 'time'"):
        validate_temporal_ordering(ds_from(df), "time")


def test_duplicate_within_group():
    df = pd.DataFrame({"id": [1, 1, 2], "time": [1.0, 1.0, 1.0], "v": [1.0, 2.0, 3.0]})
    with pytest.raises(TimeColumnError, match="Duplicate timestamps found within groups in 'time'"):
        validate_temporal_ordering(ds_from(df), "time", id_col="id")


def test_grouped_overlapping_ts_ok():
    # same ts in DIFFERENT groups is fine when id_col given
    df = pd.DataFrame({"id": [1, 2, 1, 2], "time": [1.0, 1.0, 2.0, 2.0], "v": [0.0] * 4})
    validate_temporal_ordering(ds_from(df), "time", id_col="id")


def test_equidistant_global_pass_and_fail():
    good = pd.DataFrame({"time": [1.0, 2.0, 3.0, 4.0], "v": [0.0] * 4})
    validate_temporal_ordering(ds_from(good), "time", enforce_equidistant_sampling=True)
    bad = pd.DataFrame({"time": [1.0, 2.0, 4.0, 7.0], "v": [0.0] * 4})
    with pytest.raises(TimeColumnError, match="Irregular time sampling found in 'time'"):
        validate_temporal_ordering(ds_from(bad), "time", enforce_equidistant_sampling=True)


def test_equidistant_per_group_different_rates_ok():
    # A: 1,2,3 ; B: 2,4,6 — regular within each group (reference F2 case c)
    df = pd.DataFrame({"id": ["A", "A", "A", "B", "B", "B"], "time": [1.0, 2.0, 3.0, 2.0, 4.0, 6.0], "v": [0.0] * 6})
    validate_temporal_ordering(ds_from(df), "time", id_col="id", enforce_equidistant_sampling=True)
    bad = pd.DataFrame({"id": ["A", "A", "A"], "time": [1.0, 2.0, 5.0], "v": [0.0] * 3})
    with pytest.raises(TimeColumnError, match="Irregular time sampling found within group"):
        validate_temporal_ordering(ds_from(bad), "time", id_col="id", enforce_equidistant_sampling=True)


def test_missing_id_col():
    with pytest.raises(ValueError, match="Column 'id' does not exist"):
        validate_temporal_ordering(ds_from(make_df()), "time", id_col="id")


# -- TemporalDataset lifecycle (L1/L2)
def test_temporal_dataset_setup_sorts():
    df = pd.DataFrame({"time": [3.0, 1.0, 2.0], "target": [3.0, 1.0, 2.0]})
    td = TemporalDataset(ds_from(df), time_col="time", target_col="target")
    assert list(td.ds.to_pandas()["time"]) == [1.0, 2.0, 3.0]


def test_temporal_dataset_param_errors():
    ds = ds_from(make_df())
    with pytest.raises(TypeError, match="`time_col` must be a string. Got int."):
        TemporalDataset(ds, time_col=1, target_col="target")
    with pytest.raises(ValueError, match="Invalid mode 'bogus'"):
        TemporalDataset(ds, time_col="time", target_col="target", mode="bogus")


def test_temporal_dataset_missing_columns():
    ds = ds_from(make_df())
    with pytest.raises(ValueError, match="Column 'nope' does not exist in DataFrame"):
        TemporalDataset(ds, time_col="nope", target_col="target")
    with pytest.raises(ValueError, match="Column 'nope' does not exist in DataFrame"):
        TemporalDataset(ds, time_col="time", target_col="nope")


def test_temporal_dataset_empty():
    ds = ds_from(pd.DataFrame({"time": pd.Series([], dtype="float64"), "target": pd.Series([], dtype="float64")}))
    with pytest.raises(ValueError, match="Empty DataFrame provided"):
        TemporalDataset(ds, time_col="time", target_col="target")


def test_temporal_dataset_time_conversion():
    td = TemporalDataset(
        ray.data.from_pandas(make_df(4)), time_col="time", target_col="target", time_col_conversion="numeric"
    )
    out = td.ds.to_pandas()
    assert out["time"].dtype == np.float64


def test_multi_target_list_column_warns():
    import pyarrow as pa
    from temporalscope_ray import MODE_MULTI_TARGET, TargetColumnWarning

    t = pa.table({
        "time": pa.array([1.0, 2.0]),
        "target": pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64())),
    })
    with pytest.warns(TargetColumnWarning, match="sequential data"):
        TemporalDataset(ray.data.from_arrow(t), time_col="time", target_col="target", mode=MODE_MULTI_TARGET)


def test_update_dataset_revalidates_and_sorts():
    df = pd.DataFrame({"time": [3.0, 1.0, 2.0], "target": [3.0, 1.0, 2.0]})
    td = TemporalDataset(ds_from(df), time_col="time", target_col="target")
    df2 = pd.DataFrame({"time": [9.0, 7.0, 8.0], "target": [9.0, 7.0, 8.0]})
    td.update_dataset(ds_from(df2))
    assert list(td.ds.to_pandas()["time"]) == [7.0, 8.0, 9.0]
    bad = pd.DataFrame({"time": [1.0], "other": [1.0]})
    with pytest.raises(ValueError, match="Column 'target' does not exist in DataFrame"):
        td.update_dataset(ds_from(bad))


def test_convert_numeric_epoch_to_datetime():
    from temporalscope_ray import convert_column_to_datetime_type

    # int64 microseconds since epoch → timestamp[us]
    df = pd.DataFrame({"time": [1672531200000000, 1672617600000000], "v": [1.0, 2.0]})
    out = convert_column_to_datetime_type(ds_from(df), "time").to_pandas()
    assert pd.api.types.is_datetime64_any_dtype(out["time"])
    assert out["time"].iloc[0] == pd.Timestamp("2023-01-01")


def test_convert_string_datetime_format_cascade():
    """Reference cascade parity (core_utils.py:795-802): arbitrary
    parseable string formats convert; garbage raises the reference's
    TimeColumnError message."""
    from temporalscope_ray.core import convert_column_to_datetime_type
    from temporalscope_ray.exceptions import TimeColumnError

    for vals, expect in [
        (["2023-01-01", "2023-01-02"], ["2023-01-01", "2023-01-02"]),
        (["01/15/2023", "02/20/2023"], ["2023-01-15", "2023-02-20"]),
        (["20230115", "20230220"], ["2023-01-15", "2023-02-20"]),
        (["2023/01/15 10:30:00", "2023/02/20 11:00:00"], ["2023-01-15 10:30:00", "2023-02-20 11:00:00"]),
        (["Jan 15 2023", "2023-02-20"], ["2023-01-15", "2023-02-20"]),  # mixed -> pandas inference
    ]:
        ds = ray.data.from_pandas(pd.DataFrame({"t": vals, "v": [1.0, 2.0]}))
        out = convert_column_to_datetime_type(ds, "t").to_pandas()
        assert out["t"].tolist() == [pd.Timestamp(e) for e in expect], vals

    bad = ray.data.from_pandas(pd.DataFrame({"t": ["not-a-date", "nope"], "v": [1.0, 2.0]}))
    with pytest.raises(Exception, match="must be string or numeric to convert to datetime"):
        convert_column_to_datetime_type(bad, "t").materialize()


def test_api_key_helpers(monkeypatch, capsys):
    from temporalscope_ray.core import get_api_keys, print_divider

    monkeypatch.setenv("OPENAI_API_KEY", "abc123")
    monkeypatch.delenv("CLAUDE_API_KEY", raising=False)
    keys = get_api_keys()
    assert keys["OPENAI_API_KEY"] == "abc123" and keys["CLAUDE_API_KEY"] is None
    out = capsys.readouterr().out
    assert "Warning: CLAUDE_API_KEY is not set in the environment variables." in out
    print_divider("-", 10)
    assert capsys.readouterr().out.strip() == "-" * 10
