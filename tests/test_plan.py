"""Plan-layer tests against the reference's own nexus templates (read as
data fixtures from /root/reference/domain-tests — the authoritative spec)."""

from __future__ import annotations

import json

import pytest

from kafka_to_nexus_spark.plan import StartMessage, build_plan
from kafka_to_nexus_spark.plan.nexus_structure import infer_shape
from conftest import DOMAIN_TEMPLATES


def load_template(name: str) -> dict:
    return json.loads((DOMAIN_TEMPLATES / name).read_text())


def test_writer_modules_template_walk():
    plan = build_plan(load_template("writer_modules_template.json"))
    assert "/entry" in plan.groups
    assert "/entry/instrument/chopper/rotation_speed" in plan.groups
    # static title dataset
    titles = [d for d in plan.static_datasets if d.path == "/entry/title"]
    assert titles and titles[0].values == "This is a title"
    # mdat split out
    assert plan.mdat and set(plan.mdat[0].items) == {"start_time", "end_time"}
    # stream bindings: declared f144 under rotation_speed
    f144s = [s for s in plan.streams if s.module == "f144"]
    assert any(
        s.path == "/entry/instrument/chopper/rotation_speed"
        and s.topic == "local_choppers"
        and s.source == "local:choppers:rotation_speed"
        for s in f144s
    )
    # F8: extra modules ep01 + al00 auto-spawned for every f144 stream
    for s in f144s:
        assert any(
            e.module == "ep01" and e.path == s.path and e.source == s.source
            for e in plan.streams
        )
        assert any(
            e.module == "al00" and e.path == s.path and e.source == s.source
            for e in plan.streams
        )


def test_group_attributes_captured():
    plan = build_plan(load_template("writer_modules_template.json"))
    nx = [a for a in plan.group_attributes if a.path == "/entry" and a.name == "NX_class"]
    assert nx and nx[0].values == "NXentry"


def test_topics_property():
    plan = build_plan(load_template("writer_modules_template.json"))
    assert "local_choppers" in plan.topics


def test_static_information_template():
    plan = build_plan(load_template("static_information_template.json"))
    assert plan.groups  # has structure
    # links present in this template
    assert plan.links or plan.static_datasets


def test_infer_shape():
    assert infer_shape("scalar") == []
    assert infer_shape(3.14) == []
    assert infer_shape([1, 2, 3]) == [3]
    assert infer_shape([[1, 2], [3, 4], [5, 6]]) == [3, 2]


def test_start_message_defaults():
    m = StartMessage(job_id="j", filename="f.h5", nexus_structure={})
    assert m.start_time_ms == 0 and m.stop_time_ms is None


def test_dtype_aliases_canonicalized_at_parse():
    """The reference accepts case-insensitive dtype names plus the C-ish
    aliases (f144_Writer.cpp:58-71, f144ConfigParse.data_types):
    FLOAT→float32, DOUBLE→float64, SHORT→int16, Int→int32, long→int64.
    build_plan canonicalizes once so every module and the pack step see
    one name; unknown names pass through and fall back to double
    downstream (the reference's out_of_range behavior)."""
    from kafka_to_nexus_spark.plan import build_plan
    from kafka_to_nexus_spark.schemas import spark_type_for
    from pyspark.sql import types as T

    cases = {
        "FLOAT": "float32", "float": "float32", "DOUBLE": "float64",
        "double": "float64", "SHORT": "int16", "Int": "int32",
        "long": "int64", "Uint16": "uint16", "INT8": "int8",
        "no_such_type": "no_such_type",
    }
    for given, want in cases.items():
        plan = build_plan({"children": [{
            "name": "e", "type": "group",
            "children": [{"module": "f144",
                          "config": {"topic": "t", "source": "s",
                                     "type": given,
                                     "enable_alarm_info": False,
                                     "enable_epics_con_info": False}}],
        }]})
        assert plan.streams[0].config["dtype"] == want, given
    # unknown falls back to double instead of raising
    assert spark_type_for("no_such_type") == T.DoubleType()
    assert spark_type_for("float32") == T.FloatType()


def test_da00_nameless_variable_rejected():
    """The reference throws on a da00 variable/constant without a name
    (da00 VariableConfig tests); the plan rejects it up front."""
    import pytest as _pytest

    from kafka_to_nexus_spark.plan import build_plan

    for kind in ("variables", "constants"):
        with _pytest.raises(ValueError, match="without a name"):
            build_plan({"children": [{
                "name": "e", "type": "group",
                "children": [{"module": "da00",
                              "config": {"topic": "t", "source": "s",
                                         kind: [{"data": [1]}]}}],
            }]})
    # name-only entries are legal (VariableWithOnlyNameWorks)
    plan = build_plan({"children": [{
        "name": "e", "type": "group",
        "children": [{"module": "da00",
                      "config": {"topic": "t", "source": "s",
                                 "variables": [{"name": "signal"}]}}],
    }]})
    assert plan.streams[0].module == "da00"


def test_stream_binding_requires_topic_and_source():
    """JobCreatorTests: IfTopicNotDefinedThenThrows /
    IfSourceNotDefinedThenThrows — a binding without either is a plan
    error, not a silent never-matching stream."""
    import pytest as _pytest

    from kafka_to_nexus_spark.plan import build_plan

    for missing, cfg in (
        ("topic", {"source": "s"}),
        ("source", {"topic": "t"}),
    ):
        with _pytest.raises(ValueError, match=missing):
            build_plan({"children": [{
                "name": "e", "type": "group",
                "children": [{"module": "f144", "config": cfg}],
            }]})
