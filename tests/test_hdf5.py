"""HDF5 pack path, executed end-to-end with the built-in spec-based
writer/reader (h5py is absent in this container; the file format is the
public HDF5 spec — see sinks/hdf5lib.py).

Ports the reference domain tests against real packed files:
- domain-tests/test_writer_modules.py:18-147 (f144/ep01/al00/ev44/ad00/
  da00 values, units attributes, aggregates),
- domain-tests/test_static_information.py:18-60 (hard links, statics).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
from kafka_to_nexus_spark.plan import StartMessage
from kafka_to_nexus_spark.runner import run_job
from kafka_to_nexus_spark.sinks import hdf5, hdf5lib
from kafka_to_nexus_spark.sources.fixtures import messages_from_file


def _write_file(spark, tmp_path, template: str, data: str) -> str:
    tpl = json.loads((DOMAIN_TEMPLATES / template).read_text())
    msgs = messages_from_file(spark, DOMAIN_DATA / data)
    start = StartMessage(job_id="pack", filename="out.nxs", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, msgs, str(out))
    hdf = tmp_path / "out.nxs"
    hdf5.pack(out, hdf)
    return str(hdf)


@pytest.fixture(scope="module")
def writer_modules_file(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wm")
    return _write_file(
        spark, tmp, "writer_modules_template.json", "writer_modules_data.json"
    )


@pytest.fixture(scope="module")
def static_file(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("si")
    return _write_file(
        spark, tmp, "static_information_template.json", "static_information_data.json"
    )


def test_f144_writes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/chopper/rotation_speed"
        assert f[f"{g}/value"].shape == (2,)
        assert np.array_equal(f[f"{g}/value"][:], [10, 15])
        assert np.array_equal(f[f"{g}/time"][:], [10_100_000_000, 10_110_000_000])
        assert f[f"{g}/minimum_value"][()] == 10
        assert f[f"{g}/maximum_value"][()] == 15
        assert f[f"{g}/average_value"][()] == 12.5


def test_f144_units_attributes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/chopper/rotation_speed"
        assert f[f"{g}/value"].attrs["units"] == "Hz"
        assert f[f"{g}/time"].attrs["units"] == "ns"
        assert f[f"{g}/minimum_value"].attrs["units"] == "Hz"
        assert f[f"{g}/maximum_value"].attrs["units"] == "Hz"
        assert f[f"{g}/average_value"].attrs["units"] == "Hz"
        # delay has no units in json → empty string
        assert f["/entry/instrument/chopper/delay/value"].attrs["units"] == ""


def test_ep01_writes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/chopper/rotation_speed"
        assert np.array_equal(f[f"{g}/connection_status"][:], [2, 2])
        assert np.array_equal(
            f[f"{g}/connection_status_time"][:], [10101000000, 10111000000]
        )


def test_al00_writes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/chopper/rotation_speed"
        messages = f[f"{g}/alarm_message"].asstr()[:]
        assert messages[0] == "Chopper speed is too low"
        assert messages[1] == "Chopper speed is perfect"
        assert np.array_equal(f[f"{g}/alarm_severity"][:], [1, 0])
        assert np.array_equal(
            f[f"{g}/alarm_time"][:], [10102000000, 10112000000]
        )


def test_ev44_writes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/event_detector/events"
        assert np.array_equal(
            f[f"{g}/event_time_offset"][:], [i * 10 for i in range(1, 17)]
        )
        assert np.array_equal(
            f[f"{g}/event_time_zero"][:],
            [10_200_000_000, 10_210_000_000, 10_220_000_000, 10_230_000_000],
        )
        assert np.array_equal(f[f"{g}/event_index"][:], [0, 4, 8, 12])
        assert np.array_equal(f[f"{g}/event_id"][:], [1, 2, 3, 4] * 4)


def test_ad00_writes_stacked_and_zero_filled(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/image_detector/data"
        expected = np.array([[[10, 11], [12, 13]], [[13, 12], [11, 10]]])
        assert np.array_equal(f[f"{g}/value"][:], expected)
        assert np.array_equal(
            f[f"{g}/time"][:], [10_300_000_000, 10_310_000_000]
        )
        assert f[f"{g}/value"].attrs["units"] == ""
        assert f[f"{g}/time"].attrs["units"] == "ns"


def test_da00_writes(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = "/entry/instrument/beam_monitor"
        assert np.array_equal(
            f[f"{g}/signal"][:],
            [[1, 2, 3, 4, 3, 2, 1], [4, 3, 2, 1, 2, 3, 4]],
        )
        assert np.array_equal(
            f[f"{g}/time"][:], [10_500_000_000, 10_600_000_000]
        )


def test_group_attributes_and_statics(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        assert f["/entry"].attrs["NX_class"] == "NXentry"
        assert f["/entry/title"].asstr()[()] == "This is a title"
        assert f.attrs["creator"] == "kafka_to_nexus_spark"


def test_stream_group_provenance_attrs(writer_modules_file):
    with hdf5lib.File(writer_modules_file, "r") as f:
        g = f["/entry/instrument/chopper/rotation_speed"]
        assert g.attrs["writer_module"] in ("f144", "ep01", "al00")
        assert "topic" in g.attrs and "source" in g.attrs


def test_can_create_links(static_file):
    with hdf5lib.File(static_file, "r") as f:
        assert len(f["/entry/instrument/links/linked_value"]) == 4
        assert len(f["/entry/instrument/links/linked_time"]) == 4
        assert np.array_equal(
            f["/entry/instrument/chopper/delay/value"][:],
            f["/entry/instrument/links/linked_value"][:],
        )
        assert np.array_equal(
            f["/entry/instrument/chopper/delay/time"][:],
            f["/entry/instrument/links/linked_time"][:],
        )


def test_static_data_is_written(static_file):
    with hdf5lib.File(static_file, "r") as f:
        det = "/entry/instrument/example_detector"
        assert np.array_equal(f[f"{det}/detector_number"][:], [1, 2, 3, 4, 5])
        assert np.array_equal(
            f[f"{det}/x_pixel_offset"][:], [10, 20, 30, 40, 50]
        )
        assert np.array_equal(
            f[f"{det}/pixel_shape/cylinders"][:], np.array([[0, 1, 2]])
        )
        assert np.allclose(
            f[f"{det}/pixel_shape/vertices"][:],
            np.array([[0, 0, 0], [0, 0.05, 0], [0.002, 0, 0]]),
        )


def test_streaming_staged_directory_packs(spark, tmp_path):
    """A finalized streaming out_dir packs through the same path (order
    restored from (batch, _row_order))."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json
    from kafka_to_nexus_spark.streaming.job import StreamingJob

    tpl = json.loads((DOMAIN_TEMPLATES / "buffered_template.json").read_text())
    start = StartMessage(job_id="spack", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    job = StreamingJob(spark, start, str(tmp_path / "out"))

    def f144(ts, v, o):
        return {"schema": "f144", "topic": "local_choppers",
                "kafka_timestamp": ts, "source_name": "local:choppers:delay",
                "timestamp": ts, "value": v, "offset": o}

    job.process_batch(messages_from_json(spark, [f144(11_000, 1.0, 0)]), 0)
    job.process_batch(messages_from_json(spark, [f144(12_000, 2.0, 1),
                                                 f144(13_000, 3.0, 2)]), 1)
    job.finalize()
    hdf = tmp_path / "out.nxs"
    hdf5.pack(job.out_dir, hdf)
    with hdf5lib.File(str(hdf), "r") as f:
        g = "/entry/instrument/chopper/delay"
        assert np.array_equal(f[f"{g}/value"][:], [1.0, 2.0, 3.0])
        assert np.array_equal(
            f[f"{g}/time"][:],
            [11_000_000_000, 12_000_000_000, 13_000_000_000],
        )


def test_da00_multi_variable_end_to_end(spark, tmp_path):
    """da00 golden (VERDICT r01 next-round #5): 2 variables + constants
    (explicit list + {first,last,size} linspace edge) + NXdata attrs with
    the implicit leading time axis (da00_Writer.cpp:45-387)."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    tpl = {
        "children": [{
            "name": "entry", "type": "group",
            "attributes": [{"name": "NX_class", "dtype": "string", "values": "NXentry"}],
            "children": [{
                "name": "monitor", "type": "group",
                "attributes": [{"name": "NX_class", "dtype": "string", "values": "NXdata"}],
                "children": [{
                    "module": "da00",
                    "config": {
                        "topic": "mon", "source": "histo",
                        "variables": [
                            {"name": "signal", "data_type": "float64",
                             "axes": ["x"], "shape": [4]},
                            {"name": "errors", "data_type": "float64",
                             "axes": ["x"], "shape": [4]},
                        ],
                        "constants": [
                            {"name": "x", "axes": ["x"], "data": [0.0, 1.0, 2.0, 3.0]},
                            {"name": "x_edges", "axes": ["x"],
                             "data": {"first": -0.5, "last": 3.5, "size": 5}},
                        ],
                    },
                }],
            }],
        }]
    }

    def msg(ts, sig, err, off):
        return {
            "schema": "da00", "topic": "mon", "kafka_timestamp": ts,
            "source_name": "histo", "timestamp": ts, "offset": off,
            "variables": [
                {"name": "signal", "axes": ["x"], "data": sig},
                {"name": "errors", "axes": ["x"], "data": err},
            ],
        }

    msgs = messages_from_json(spark, [
        msg(11_000, [1, 2, 3, 4], [0.1, 0.2, 0.3, 0.4], 0),
        msg(12_000, [4, 3, 2, 1], [0.4, 0.3, 0.2, 0.1], 1),
    ])
    start = StartMessage(job_id="da00", filename="f.nxs", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    res = run_job(spark, start, msgs, str(tmp_path / "staged"))

    # constants landed in job metadata (write-once)
    assert res.metadata_values["/entry/monitor/x"] == [0.0, 1.0, 2.0, 3.0]
    assert res.metadata_values["/entry/monitor/x_edges"] == [-0.5, 0.5, 1.5, 2.5, 3.5]

    hdf = tmp_path / "out.nxs"
    hdf5.pack(tmp_path / "staged", hdf)
    with hdf5lib.File(str(hdf), "r") as f:
        assert np.array_equal(
            f["/entry/monitor/signal"][:], [[1, 2, 3, 4], [4, 3, 2, 1]]
        )
        assert np.array_equal(
            f["/entry/monitor/errors"][:],
            [[0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1]],
        )
        assert np.array_equal(
            f["/entry/monitor/time"][:], [11_000_000_000, 12_000_000_000]
        )
        assert np.array_equal(f["/entry/monitor/x"][:], [0.0, 1.0, 2.0, 3.0])
        assert np.array_equal(
            f["/entry/monitor/x_edges"][:], [-0.5, 0.5, 1.5, 2.5, 3.5]
        )
        # NXdata attrs: default signal + axes with implicit time axis
        attrs = f["/entry/monitor"].attrs
        assert attrs["signal"] == "signal"
        assert list(attrs["axes"]) == ["time", "x"]


def test_da00_constant_from_first_message(spark, tmp_path):
    """A constant without configured data is taken from the first message
    (da00_Writer.cpp:92-130 write_constant_dataset path)."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    tpl = {
        "children": [{
            "name": "entry", "type": "group", "attributes": [],
            "children": [{
                "name": "mon", "type": "group", "attributes": [],
                "children": [{
                    "module": "da00",
                    "config": {
                        "topic": "t", "source": "s",
                        "variables": [{"name": "signal", "axes": ["x"], "shape": [3]}],
                        "constants": [{"name": "x"}],
                    },
                }],
            }],
        }]
    }
    msgs = messages_from_json(spark, [{
        "schema": "da00", "topic": "t", "kafka_timestamp": 11_000,
        "source_name": "s", "timestamp": 11_000, "offset": 0,
        "variables": [
            {"name": "signal", "axes": ["x"], "data": [5, 6, 7]},
            {"name": "x", "axes": ["x"], "data": [10.0, 20.0, 30.0]},
        ],
    }])
    start = StartMessage(job_id="da00c", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    res = run_job(spark, start, msgs, str(tmp_path / "staged"))
    assert res.metadata_values["/entry/mon/x"] == [10.0, 20.0, 30.0]


def test_pack_from_instrument_template(spark, tmp_path):
    """S6: the output file is initialised from the per-instrument template
    ({prefix}/{instrument}/{instrument}.hdf, Master.cpp:92-98); job content
    is written alongside."""
    tpl_file = hdf5.template_path(tmp_path, "dream")
    tpl_file.parent.mkdir(parents=True)
    with hdf5lib.File(tpl_file, "w") as t:
        g = t.require_group("/entry/instrument")
        g.attrs["NX_class"] = "NXinstrument"
        t.create_dataset("/entry/instrument/name", data="DREAM")

    hdf = _write_file(spark, tmp_path, "writer_modules_template.json",
                      "writer_modules_data.json")
    out = tmp_path / "templated.nxs"
    hdf5.pack(tmp_path / "staged", out, template_file=tpl_file)
    with hdf5lib.File(str(out), "r") as f:
        assert f["/entry/instrument/name"].asstr()[()] == "DREAM"  # template
        assert np.array_equal(
            f["/entry/instrument/chopper/rotation_speed/value"][:], [10, 15]
        )  # job content


# ---------------------------------------------------------------------------
# Property: the spec-based writer and the independent spec-based reader
# round-trip arbitrary trees — shapes, dtypes, attributes, nesting.
# ---------------------------------------------------------------------------

from hypothesis import example, given, settings
from hypothesis import strategies as st

_DTYPES = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
           np.int64, np.uint64, np.float32, np.float64]


@st.composite
def _dataset(draw):
    dt = draw(st.sampled_from(_DTYPES))
    rank = draw(st.integers(min_value=1, max_value=3))
    shape = tuple(draw(st.integers(min_value=0, max_value=4)) for _ in range(rank))
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        elems = st.integers(min_value=int(info.min), max_value=int(info.max))
    else:
        elems = st.floats(allow_nan=False, allow_infinity=False, width=32)
    n = int(np.prod(shape))
    values = draw(st.lists(elems, min_size=n, max_size=n))
    return np.asarray(values, dtype=dt).reshape(shape)


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), _dataset()),
        min_size=1, max_size=4,
    ),
    attr_num=st.integers(min_value=-2**31, max_value=2**31 - 1),
    attr_text=st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=24,
    ),
    depth=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=40, deadline=None)
def test_hdf5lib_round_trip_property(tmp_path_factory, data, attr_num, attr_text, depth):
    tmp = tmp_path_factory.mktemp("prop")
    path = tmp / "t.h5"
    group_path = "/".join(f"g{i}" for i in range(depth)) or "root_grp"
    with hdf5lib.File(path, "w") as f:
        g = f.require_group(group_path)
        g.attrs["n"] = attr_num
        g.attrs["s"] = attr_text
        for i, (tag, arr) in enumerate(data):
            ds = g.create_dataset(f"d{i}_{tag}", data=arr)
            ds.attrs["units"] = "m"
    with hdf5lib.File(path, "r") as f:
        g = f[group_path]
        assert g.attrs["n"] == attr_num
        assert g.attrs["s"] == attr_text
        for i, (tag, arr) in enumerate(data):
            got = g[f"d{i}_{tag}"][()]
            assert got.dtype == arr.dtype
            assert got.shape == arr.shape
            np.testing.assert_array_equal(got, arr)
            assert g[f"d{i}_{tag}"].attrs["units"] == "m"


@given(
    # min_size=1: an empty python list carries no element type (numpy
    # defaults it to float64), same as h5py needing an explicit dtype
    strings=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=40,
        ),
        min_size=1, max_size=12,
    ),
    scalar=st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=60,
    ),
    attr_strings=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=30,
        ),
        min_size=1, max_size=6,
    ),
)
@settings(max_examples=40, deadline=None)
def test_hdf5lib_vlen_string_round_trip_property(
    tmp_path_factory, strings, scalar, attr_strings
):
    """Verdict #6: mixed-length UTF-8 strings round-trip through the
    global-heap-backed vlen path — datasets (scalar + 1-d) and attributes
    (scalar + 1-d) — with no h5py involved."""
    tmp = tmp_path_factory.mktemp("vlen")
    path = tmp / "t.h5"
    with hdf5lib.File(path, "w") as f:
        g = f.require_group("entry")
        g.create_dataset("scalar", data=scalar)
        g.create_dataset("listed", data=strings)
        g.attrs["s"] = scalar
        g.attrs["many"] = attr_strings
    with hdf5lib.File(path, "r") as f:
        g = f["entry"]
        assert g["scalar"].asstr()[()] == scalar
        assert list(g["listed"].asstr()[:]) == strings
        assert g.attrs["s"] == scalar
        assert list(g.attrs["many"]) == attr_strings


def test_hdf5lib_multilevel_chunk_btree_round_trip(tmp_path):
    """Datasets with more chunks than one v1 B-tree node holds (64/node)
    get a multi-level index — 5000 single-row chunks needs leaves, an
    internal level, and a root (level 2). The 16-bit entries-used field
    must never see more than 64, and the reader walks the full tree."""
    import struct as _struct

    path = tmp_path / "deep.h5"
    arr = np.arange(5000, dtype=np.int64)
    with hdf5lib.File(path, "w") as f:
        f.create_dataset("d", data=arr, chunks=1)
    raw = path.read_bytes()
    n_nodes, max_entries, max_level = 0, 0, 0
    pos = raw.find(b"TREE")
    while pos != -1:
        ntype, level, entries = _struct.unpack_from("<BBH", raw, pos + 4)
        if ntype == 1:
            n_nodes += 1
            max_entries = max(max_entries, entries)
            max_level = max(max_level, level)
        pos = raw.find(b"TREE", pos + 4)
    assert n_nodes > 64  # 79 leaves + 2 internal + root
    assert max_entries <= 64
    assert max_level == 2
    with hdf5lib.File(path, "r") as f:
        np.testing.assert_array_equal(f["d"][()], arr)


def test_pack_twice_same_path(tmp_path, spark):
    """pack() chmods the finished file to 0o444; a second pack() to the
    same path is legal overwrite semantics and must restore write
    permission instead of failing with PermissionError."""
    from kafka_to_nexus_spark.sinks import hdf5, staging

    import json

    out = tmp_path / "staged"
    df = spark.createDataFrame([(1, 2.0)], "time: long, value: double")
    staging.write_dataset(df, str(out), "/entry/s", "log")
    meta = {
        "job": {}, "groups": ["/entry", "/entry/s"], "group_attributes": [],
        "static_datasets": [], "links": [], "mdat": {}, "metadata_values": {},
        "streams": [{"path": "/entry/s", "topic": "t", "source": "s",
                     "module": "f144", "config": {}, "datasets": ["log"]}],
    }
    (out / staging.META_FILE).write_text(json.dumps(meta))
    hdf = tmp_path / "out.h5"
    hdf5.pack(str(out), str(hdf))
    assert (hdf.stat().st_mode & 0o777) == 0o444
    hdf5.pack(str(out), str(hdf))  # re-pack: must not raise
    assert (hdf.stat().st_mode & 0o777) == 0o444
    with hdf5lib.File(hdf, "r") as f:
        np.testing.assert_array_equal(f["/entry/s/value"][()], [2.0])


@given(
    arr=_dataset(),
    chunk_rows=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=40, deadline=None)
def test_hdf5lib_chunked_round_trip_property(tmp_path_factory, arr, chunk_rows):
    """Verdict #7: chunked layout (v1 B-tree index, zero-padded edge
    chunks) round-trips every dtype/shape the contiguous path supports,
    including chunk sizes larger than the dataset and partial final
    chunks."""
    tmp = tmp_path_factory.mktemp("chunked")
    path = tmp / "t.h5"
    with hdf5lib.File(path, "w") as f:
        f.create_dataset("d", data=arr, chunks=chunk_rows)
    with hdf5lib.File(path, "r") as f:
        got = f["d"][()]
        assert got.dtype == arr.dtype
        assert got.shape == arr.shape
        np.testing.assert_array_equal(got, arr)


def test_hdf5lib_hard_link_cycle(tmp_path):
    """A group hard-linked into its own subtree is legal HDF5; the writer
    patches the cyclic link address (and the header checksum) instead of
    recursing forever."""
    p = str(tmp_path / "cycle.h5")
    with hdf5lib.File(p, "w") as f:
        g = f.require_group("a")
        f["a/self"] = g
        g.attrs["marker"] = 7
    with hdf5lib.File(p) as r:
        assert r["a"].attrs["marker"] == 7
        assert r["a/self"].attrs["marker"] == 7
        assert r["a/self/self/self"].attrs["marker"] == 7


def test_hdf5lib_big_endian_attribute(tmp_path):
    """Attribute payloads are byteswapped to the declared little-endian
    datatype, like the dataset path — big-endian input must round-trip by
    value, not by raw bytes."""
    import numpy as np

    p = str(tmp_path / "be.h5")
    with hdf5lib.File(p, "w") as f:
        f.attrs["x"] = np.array([1, 2], dtype=">i4")
        f.attrs["y"] = np.array([3.5], dtype=">f8")
    with hdf5lib.File(p) as r:
        assert list(r.attrs["x"]) == [1, 2]
        assert list(r.attrs["y"]) == [3.5]


def test_hdf5lib_gcol_minimum_size(tmp_path):
    """Global Heap Collections are at least libhdf5's 4096-byte minimum
    (spec-strict readers reject smaller), with the slack declared as
    object 0's free space."""
    import struct as _struct

    p = str(tmp_path / "gcol.h5")
    with hdf5lib.File(p, "w") as f:
        f.attrs["s"] = "short"
    raw = open(p, "rb").read()
    i = raw.index(b"GCOL")
    size = _struct.unpack_from("<Q", raw, i + 8)[0]
    assert size >= 4096 and size % 8 == 0
    with hdf5lib.File(p) as r:
        assert r.attrs["s"] == "short"


def test_pack_skips_none_metadata_values(tmp_path, spark):
    """Zero-message sources leave min/max/average as None; pack writes NO
    aggregate dataset for them (reference close-time guards) instead of
    crashing h5py on data=None or staging a bogus empty dataset."""
    tpl = {"children": [{
        "name": "entry", "type": "group",
        "children": [{
            "name": "quiet", "type": "group",
            "children": [{"module": "f144",
                          "config": {"topic": "t", "source": "never",
                                     "dtype": "double"}}],
        }],
    }]}
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    start = StartMessage(job_id="none-meta", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, []), str(out))
    hdf = str(tmp_path / "out.nxs")
    hdf5.pack(out, hdf)
    with hdf5lib.File(hdf) as f:
        assert "/entry/quiet/minimum_value" not in f
        assert "/entry/quiet/maximum_value" not in f


def test_pack_job_statics_override_template_content(tmp_path, spark):
    """T2 precedence: the job's nexus_structure wins over template-file
    content at the same path (the reference initialises from the template
    THEN writes the job structure over it, JobCreator.cpp:32-43)."""
    tpl_file = str(tmp_path / "inst.hdf")
    with hdf5lib.File(tpl_file, "w") as t:
        t.create_dataset("/entry/title", data="old")
    structure = {"children": [{
        "name": "entry", "type": "group",
        "children": [{"module": "dataset",
                      "config": {"name": "title", "values": "new"}}],
    }]}
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    start = StartMessage(job_id="tpl-prec", filename="f",
                         nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, []), str(out))
    hdf = str(tmp_path / "out.nxs")
    hdf5.pack(out, hdf, template_file=tpl_file)
    with hdf5lib.File(hdf) as f:
        assert f["/entry/title"][()] == "new"


def test_pack_da00_partial_variable_stays_time_aligned(tmp_path):
    """A message missing one declared variable zero-fills its row instead
    of being dropped — dropping would shift variable[i] off time[i]."""
    import pandas as pd

    class _Grp(dict):
        def create_dataset(self, name, data=None, chunks=None):
            self[name] = np.asarray(data)

            class _A:
                attrs = {}

            a = _A()
            a.data = data
            return a

    grp = _Grp()
    pdf = pd.DataFrame({
        "time": [1, 2],
        "data_signal": [[1.0, 2.0], [3.0, 4.0]],
        "data_background": [[9.0, 8.0], None],
    })
    hdf5._pack_da00_frames(grp, pdf, chunk_size=1024)
    assert grp["signal"].shape == (2, 2)
    assert grp["background"].shape == (2, 2)
    assert list(grp["background"][1]) == [0.0, 0.0]
    assert len(grp["time"]) == 2


def test_pack_ad00_honours_configured_dtype(tmp_path):
    """ad00's stacked value dataset uses the stream's configured dtype
    instead of hard-coded float64. (Through the Spark pipeline the
    array<double> envelope bounds integer exactness at 2^53 — this
    exercises the pack-layer contract directly.)"""
    import pandas as pd

    class _Grp(dict):
        def create_dataset(self, name, data=None, chunks=None):
            self[name] = np.asarray(data)

            class _A:
                attrs = {}

            return _A()

    grp = _Grp()
    pdf = pd.DataFrame({"time": [1], "shape": [[2]],
                        "data": [[2**53 + 1, 3]]})
    hdf5._pack_ad00_frames(grp, pdf, chunk_size=16, dtype=np.uint64)
    assert grp["value"].dtype == np.uint64
    assert int(grp["value"][0][0]) == 2**53 + 1


def test_pack_under_strict_h5py_semantics(tmp_path, spark, monkeypatch):
    """Drive pack() with h5py's REJECTION semantics enforced on top of the
    built-in writer (h5py itself is absent in this container): create_dataset
    must never be called with data=None (TypeError in h5py) nor with a
    numpy '<U' array (h5py: no conversion path). This executes the code
    paths the preferred backend would take — a zero-message source (None
    aggregates), al00 string columns, and statics — under the constraints
    that made them crash before the round-4 hardening."""
    import numpy as _np

    orig = hdf5lib.Group.create_dataset

    def strict(self, name, data=None, chunks=None):
        if data is None:
            raise TypeError("one of data, shape or dtype must be specified")
        if not isinstance(data, (str, bytes)):
            arr = data if isinstance(data, _np.ndarray) else _np.asarray(data)
            if arr.dtype.kind == "U":
                raise TypeError(f"No conversion path for dtype {arr.dtype}")
        return orig(self, name, data=data, chunks=chunks)

    monkeypatch.setattr(hdf5lib.Group, "create_dataset", strict)

    # a job with: data-bearing f144 (+auto al00 strings), a QUIET f144
    # (None aggregates), and a static dataset
    tpl = {"children": [{
        "name": "entry", "type": "group",
        "children": [
            {"module": "dataset", "config": {"name": "title", "values": "t"}},
            {"module": "dataset",
             "config": {"name": "names", "values": ["a", "bb"]}},
            {"name": "live", "type": "group",
             "children": [{"module": "f144",
                           "config": {"topic": "t", "source": "s",
                                      "dtype": "double"}}]},
            {"name": "quiet", "type": "group",
             "children": [{"module": "f144",
                           "config": {"topic": "t", "source": "never",
                                      "dtype": "double",
                                      "enable_alarm_info": False,
                                      "enable_epics_con_info": False}}]},
        ],
    }]}
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    rows = [
        {"schema": "f144", "topic": "t", "source_name": "s",
         "timestamp": 11_000, "kafka_timestamp": 11_000, "value": 1.5,
         "offset": 0},
        {"schema": "al00", "topic": "t", "source_name": "s",
         "timestamp": 11_500, "kafka_timestamp": 11_500, "severity": 1,
         "message": "too warm", "offset": 1},
    ]
    start = StartMessage(job_id="strict", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, rows), str(out))
    hdf = str(tmp_path / "strict.nxs")
    hdf5.pack(out, hdf)
    monkeypatch.setattr(hdf5lib.Group, "create_dataset", orig)
    with hdf5lib.File(hdf) as f:
        assert list(f["/entry/live/value"][:]) == [1.5]
        assert f["/entry/live/alarm_message"][0] == "too warm"
        assert f["/entry/title"][()] == "t"
        assert list(f["/entry/names"][:]) == ["a", "bb"]
        assert "/entry/quiet/minimum_value" not in f


def test_pack_ev44_without_pixel_ids(tmp_path, spark):
    """ev44 allows empty pixel_ids while time_of_flight is present
    (ev44_WriterTests.WriterSuccessfullyRecordsEventDataWithoutPixelIds):
    the packed event_id dataset stays EMPTY (typed) while
    event_time_offset carries the TOF values — per-dataset append
    semantics, not null-padded columns."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    tpl = {"children": [{
        "name": "entry", "type": "group",
        "children": [{
            "name": "det", "type": "group",
            "children": [{"module": "ev44",
                          "config": {"topic": "t", "source": "d"}}],
        }],
    }]}
    rows = [{"schema": "ev44", "topic": "t", "source_name": "d",
             "timestamp": 11_000, "kafka_timestamp": 11_000, "message_id": 0,
             "reference_time": [11_000], "reference_time_index": [0],
             "time_of_flight": [101, 102, 201], "pixel_ids": [],
             "offset": 0}]
    start = StartMessage(job_id="nopix", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, rows), str(out))
    hdf = str(tmp_path / "out.nxs")
    hdf5.pack(out, hdf)
    with hdf5lib.File(hdf) as f:
        assert list(f["/entry/det/event_time_offset"][:]) == [101, 102, 201]
        ev_id = f["/entry/det/event_id"][:]
        assert len(ev_id) == 0
        assert np.asarray(ev_id).dtype.kind in "iu"  # typed empty, not NaN floats


def test_hdf5lib_reader_survives_corruption(tmp_path):
    """Bit-flipped files must raise a clean error (or, for flips in slack
    space, still read) — never hang or crash the interpreter. The
    checksummed superblock/headers make most corruption detectable."""
    import random

    p = str(tmp_path / "fuzz.h5")
    with hdf5lib.File(p, "w") as f:
        g = f.require_group("g")
        g.create_dataset("d", data=np.arange(100, dtype=np.int64),
                         chunks=(16,))
        g.attrs["s"] = "hello"
    raw = bytearray(open(p, "rb").read())
    rng = random.Random(11)
    outcomes = {"ok": 0, "err": 0}
    for _ in range(60):
        b = bytearray(raw)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        q = tmp_path / "fz.h5"
        q.write_bytes(bytes(b))
        try:
            with hdf5lib.File(str(q)) as r:
                _ = list(r["g/d"][:])
                _ = r["g"].attrs["s"]
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1  # clean failure
    assert outcomes["ok"] + outcomes["err"] == 60
    assert outcomes["err"] > 0  # corruption is actually detected sometimes


def test_pack_preserves_nan_float_values(tmp_path):
    """A genuine IEEE NaN reading (a legal f144 value, stored as NaN —
    not null — in parquet) must be WRITTEN in place, never dropped: only
    true parquet nulls take the per-dataset-append path, or paired
    value/time datasets desync. Distinguishable only via the arrow
    validity mask (pandas maps both to NaN)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from kafka_to_nexus_spark.sinks import staging

    out = tmp_path / "staged"
    ds = staging.dataset_dir(out, "/entry/pv", "log")
    ds.mkdir(parents=True)
    t = pa.table({
        "time": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([1.0, float("nan"), 3.0], pa.float64()),
        "alarm": pa.array([None, 7, None], pa.int64()),  # true nulls
    })
    _pq.write_table(t, ds / "part-0.parquet")
    meta = {
        "groups": ["/entry", "/entry/pv"], "group_attributes": [],
        "static_datasets": [], "links": [], "metadata_values": {},
        "job": {},
        "streams": [{"path": "/entry/pv", "topic": "t", "source": "s",
                     "module": "f144", "config": {},
                     "datasets": ["log"]}],
    }
    import json as _json

    (out / "_nexus_meta.json").write_text(_json.dumps(meta))
    hdf = str(tmp_path / "o.nxs")
    hdf5.pack(out, hdf)
    with hdf5lib.File(hdf) as f:
        vals = list(f["/entry/pv/value"][:])
        assert len(vals) == 3 and math.isnan(vals[1])  # NaN kept IN PLACE
        assert list(f["/entry/pv/time"][:]) == [1, 2, 3]
        assert list(f["/entry/pv/alarm"][:]) == [7]  # true nulls dropped


def test_vlen_heap_is_pooled_not_per_attribute(tmp_path):
    """The 4096-byte GCOL minimum must be paid per ~16 KB collection,
    not per string attribute: a file with 100 string attrs (the
    1000-source shape writes topic/source/writer_module per group) stays
    far below 100 x 4096 bytes, and repeated strings dedup."""
    p = str(tmp_path / "pool.h5")
    with hdf5lib.File(p, "w") as f:
        for i in range(100):
            g = f.require_group(f"g{i}")
            g.attrs["topic"] = "shared_topic"   # repeated → deduped
            g.attrs["source"] = f"src_{i}"      # distinct
            g.attrs["writer_module"] = "f144"   # repeated
    size = len(open(p, "rb").read())
    assert size < 100 * 4096 / 4, size  # would be ~1.2 MB un-pooled
    with hdf5lib.File(p) as r:
        assert r["g7"].attrs["topic"] == "shared_topic"
        assert r["g42"].attrs["source"] == "src_42"
        assert r["g99"].attrs["writer_module"] == "f144"


def test_gcol_refcount_clamped_to_16_bits():
    """The GCOL refcount field is 16-bit: the pooled heap's occurrence
    count can exceed 65535 (a shared empty units attr at huge source
    counts) and must clamp instead of raising struct.error — refcounts
    only drive deletion tracking, which the write-once serializer never
    does."""
    import struct

    blob = hdf5lib._gcol([(b"unit", 70_000)])
    # collection header is 16 bytes; first object header follows
    idx, refs, _reserved, length = struct.unpack_from("<HHIQ", blob, 16)
    assert (idx, refs, length) == (1, 0xFFFF, 4)


def test_pack_all_null_string_column(tmp_path, monkeypatch):
    """An ALL-null string column must pack as an empty vlen-str dataset:
    h5py rejects object-dtype empty arrays without an explicit string
    dtype ('Object dtype has no native HDF5 equivalent') — enforce that
    rejection on the facade and require pack() to survive it."""
    import json as _json

    import numpy as _np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from kafka_to_nexus_spark.sinks import staging

    orig = hdf5lib.Group.create_dataset

    def strict(self, name, data=None, chunks=None, dtype=None):
        if data is not None and not isinstance(data, (str, bytes)):
            arr = data if isinstance(data, _np.ndarray) else _np.asarray(data)
            if arr.dtype == object and dtype is None and not len(arr):
                raise TypeError("Object dtype dtype('O') has no native HDF5 equivalent")
        return orig(self, name, data=data, chunks=chunks, dtype=dtype)

    monkeypatch.setattr(hdf5lib.Group, "create_dataset", strict)
    out = tmp_path / "staged"
    ds = staging.dataset_dir(out, "/entry/pv", "alarms")
    ds.mkdir(parents=True)
    t = pa.table({
        "alarm_time": pa.array([1, 2], pa.int64()),
        "alarm_severity": pa.array([0, 0], pa.int64()),
        "alarm_message": pa.array([None, None], pa.string()),  # ALL null
    })
    _pq.write_table(t, ds / "part-0.parquet")
    meta = {
        "groups": ["/entry", "/entry/pv"], "group_attributes": [],
        "static_datasets": [], "links": [], "metadata_values": {},
        "job": {},
        "streams": [{"path": "/entry/pv", "topic": "t", "source": "s",
                     "module": "al00", "config": {},
                     "datasets": ["alarms"]}],
    }
    (out / "_nexus_meta.json").write_text(_json.dumps(meta))
    hdf = str(tmp_path / "o.nxs")
    hdf5.pack(out, hdf)
    with hdf5lib.File(hdf) as f:
        assert list(f["/entry/pv/alarm_time"][:]) == [1, 2]
        assert len(f["/entry/pv/alarm_message"][:]) == 0


# --- pooled vlen heap: heap-block-boundary property sweep (verdict r4 #5) ---
# The pooled _VlenHeap packs distinct strings into shared GCOLs, flushing
# at ~16 KB of content per collection. These strategies are built to cross
# that boundary from every direction: many small strings (hundreds per
# collection), single strings bigger than one collection, empty strings
# (zero-length heap objects), repeats (dedup + refcounts), and unicode
# (byte length != char length, so padding math is exercised).
_vlen_strings = st.lists(
    st.one_of(
        st.just(""),
        st.text(max_size=12),
        st.text(alphabet="αβγ∂éñ日本語", min_size=1, max_size=9),
        # big strings: cross one 16 KB collection, or exceed it outright
        st.integers(min_value=1000, max_value=20_000).map(
            lambda n: "x" * n
        ),
    ),
    min_size=1,
    max_size=120,
)


@given(strings=_vlen_strings, reps=st.integers(min_value=1, max_value=3))
# regression (r8): a trailing '\x00' CHARACTER in a vlen attr array came
# back stripped — numpy fixed-width unicode NUL-pads, so the reader must
# return object arrays
@example(strings=["\x00"], reps=1)
@settings(max_examples=30, deadline=None)
def test_vlen_heap_block_boundary_round_trip(tmp_path_factory, strings, reps):
    """Every vlen string written through the pooled heap — as a dataset,
    as attributes, interleaved with fixed-dtype data — must read back
    exactly, across collection-flush boundaries, dedup of repeats, empty
    strings, and multi-byte encodings."""
    tmp = tmp_path_factory.mktemp("vlen")
    path = tmp / "pool.h5"
    data = strings * reps  # repeats share heap objects (refcount path)
    with hdf5lib.File(path, "w") as f:
        g = f.require_group("g")
        g.create_dataset("strs", data=np.array(data, dtype=object))
        g.create_dataset("nums", data=np.arange(7, dtype=np.int32))
        # attributes ride the same pooled heap as the dataset payloads
        g.attrs["one"] = strings[0]
        g.attrs["all"] = np.array(strings[:40], dtype=object)
    with hdf5lib.File(path, "r") as f:
        got = [s for s in f["g/strs"][:]]
        assert got == data
        assert list(f["g/nums"][:]) == list(range(7))
        assert f["g"].attrs["one"] == strings[0]
        assert list(f["g"].attrs["all"]) == strings[:40]


def test_string_dtype_rejects_fixed_length_and_non_utf8():
    """The h5py-compatible string_dtype facade only implements vlen utf-8;
    a fixed-length (length=N) or non-utf-8 request must fail loudly
    instead of silently returning the vlen object representation."""
    assert hdf5lib.string_dtype() == np.dtype(object)
    assert hdf5lib.string_dtype("utf-8") == np.dtype(object)
    with pytest.raises(NotImplementedError):
        hdf5lib.string_dtype(length=16)
    with pytest.raises(NotImplementedError):
        hdf5lib.string_dtype(encoding="ascii")


@given(
    n_rep=st.integers(min_value=65_536, max_value=75_000),
    rep_s=st.one_of(st.just(""), st.text(min_size=1, max_size=8),
                    st.text(alphabet="éñ日本", min_size=1, max_size=4)),
    big_sizes=st.lists(st.integers(min_value=2_000, max_value=18_000),
                       min_size=3, max_size=10),
)
@settings(max_examples=8, deadline=None)
def test_refcount_clamp_on_real_write_path_with_multiblock_heap(
    tmp_path_factory, n_rep, rep_s, big_sizes
):
    """Verdict r5 #6: the 16-bit GCOL refcount clamp and the multi-block
    pooled heap, exercised TOGETHER through the real writer (not the
    _gcol unit test): one string repeated >65535 times (clamp path, incl.
    empty and multi-byte strings) interleaved with fixed-dtype data and
    enough big distinct strings to flush several collections —
    everything must read back exactly."""
    import numpy as np

    p = str(tmp_path_factory.mktemp("clamp") / "clamp.h5")
    big = ["block_%04d_" % i + "y" * n for i, n in enumerate(big_sizes)]
    with hdf5lib.File(p, "w") as f:
        g = f.require_group("g")
        g.create_dataset("rep", data=np.array([rep_s] * n_rep, dtype=object))
        g.create_dataset("nums", data=np.arange(64, dtype=np.float64))
        g.create_dataset("big", data=np.array(big, dtype=object))
        g.attrs["rep_attr"] = rep_s     # same heap object as the dataset
        g.attrs["bignote"] = big[0]
    with hdf5lib.File(p) as r:
        rep = r["g/rep"][:]
        assert len(rep) == n_rep and all(s == rep_s for s in rep)
        assert list(r["g/nums"][:]) == list(range(64))
        assert [s for s in r["g/big"][:]] == big
        assert r["g"].attrs["rep_attr"] == rep_s
        assert r["g"].attrs["bignote"] == big[0]
    try:  # cross-reader check when the real library exists (not in CI env)
        import h5py  # noqa: F401
    except ImportError:
        return
    with h5py.File(p) as hf:
        assert hf["g/rep"].asstr()[0] == rep_s and hf["g/rep"].shape == (n_rep,)
        assert [s for s in hf["g/big"].asstr()[:]] == big
