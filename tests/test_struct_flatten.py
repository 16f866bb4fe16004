"""Vectorized Arrow-struct flatten / list explode fast path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from transmog_ray.stages.struct_flatten import (
    explode_list_column,
    flatten_struct_columns,
    flatten_struct_dataset,
)


@pytest.fixture()
def struct_table():
    return pa.table(
        {
            "id": [1, 2, 3],
            "meta": [
                {"title": "a", "headers": {"server": "nginx", "code": 200}},
                {"title": None, "headers": {"server": "caddy", "code": 404}},
                None,
            ],
            "links": [
                [{"href": "x", "depth": 1}, {"href": "y", "depth": 2}],
                [],
                [{"href": "z", "depth": None}],
            ],
            "tags": [["p", "q"], ["r"], []],
        }
    )


def test_flatten_struct_columns(struct_table):
    out = flatten_struct_columns(struct_table)
    # column order follows Arrow's struct field order (alphabetical when
    # inferred from python dicts); compare as a set
    assert set(out.column_names) == {
        "id", "meta_title", "meta_headers_server", "meta_headers_code",
        "links", "tags",
    }
    assert out["meta_title"].to_pylist() == ["a", None, None]
    # parent-null propagation: row 3's meta is null → all children null
    assert out["meta_headers_server"].to_pylist() == ["nginx", "caddy", None]
    assert out["meta_headers_code"].to_pylist() == [200, 404, None]
    # row count unchanged, lists untouched
    assert out.num_rows == 3
    assert out["tags"].to_pylist() == [["p", "q"], ["r"], []]


def test_explode_list_column(struct_table):
    kids = explode_list_column(struct_table, "links", parent_cols=["id"])
    assert set(kids.column_names) == {"id", "href", "depth"}
    assert kids["id"].to_pylist() == [1, 1, 3]  # row 2 has no links
    assert kids["href"].to_pylist() == ["x", "y", "z"]
    assert kids["depth"].to_pylist() == [1, 2, None]


def test_explode_primitive_list(struct_table):
    vals = explode_list_column(struct_table, "tags", parent_cols=["id"])
    assert set(vals.column_names) == {"id", "value"}
    assert vals["value"].to_pylist() == ["p", "q", "r"]
    assert vals["id"].to_pylist() == [1, 1, 2]


def test_flatten_struct_dataset(ray_session, struct_table):
    import ray.data as rd

    ds = rd.from_arrow(struct_table)
    out = flatten_struct_dataset(ds).to_pandas()
    assert "meta_headers_server" in out.columns
    assert len(out) == 3
