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
