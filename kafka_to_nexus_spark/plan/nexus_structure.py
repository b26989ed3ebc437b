"""T1 — nexus_structure walk: JSON tree → Plan.

The ``nexus_structure`` JSON is simultaneously the output schema and the
query plan (SURVEY.md §1.2): ``{"type":"group"}`` nodes create hierarchy,
``{"module":"dataset"}`` static data, ``{"module":"link"}`` links,
``{"module":"mdat"}`` run-metadata slots, and any other
``{"module": id, "config": {...}}`` is a stream binding.

Reference: recursive walk src/HDFOperations.cpp:375-467; shape inference
:22-52; mdat split src/JobCreator.cpp:111-121,137-141; attribute parsing
:54-208; spec documentation/commands.md:45-214.
"""

from __future__ import annotations

from .model import Attribute, Link, MdatBinding, Plan, StaticDataset, StreamBinding

KNOWN_STRUCTURE_MODULES = {"dataset", "link", "mdat"}

# F8 extra modules: f144/se00/tdct streams auto-spawn ep01 + al00 writers for
# the same (topic, source, group), enabled by default and gated by config
# booleans enable_epics_con_info / enable_alarm_info.
# Reference: WriterModuleBase.cpp:19-31 (default true), f144_Writer.h:44-46,
# se00_Writer.h:38, tdct_Writer.h:30, spawn loop JobCreator.cpp:160-168.
EXTRA_MODULES = {
    "f144": (("epics_con_info", "ep01"), ("alarm_info", "al00")),
    "se00": (("epics_con_info", "ep01"), ("alarm_info", "al00")),
    "tdct": (("epics_con_info", "ep01"), ("alarm_info", "al00")),
}

# the reference's C-ish dtype alias names (f144_Writer.cpp:62-70);
# applied after lowercasing, so "SHORT"/"Int"/"FLOAT" all resolve
_DTYPE_ALIASES = {
    "short": "int16",
    "int": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
}


def infer_shape(values) -> list[int]:
    """Shape from JSON nesting (HDFOperations.cpp:22-52): scalar → [],
    nested lists → per-level extents (first-child extent per level)."""
    shape: list[int] = []
    v = values
    while isinstance(v, list):
        shape.append(len(v))
        v = v[0] if v else None
    return shape


def _parse_attributes(node: dict, path: str) -> list[Attribute]:
    attrs = node.get("attributes", [])
    out: list[Attribute] = []
    if isinstance(attrs, dict):  # {"name": value} short form
        for name, values in attrs.items():
            out.append(Attribute(path=path, name=name, values=values))
        return out
    for a in attrs:
        out.append(
            Attribute(
                path=path,
                name=a["name"],
                values=a.get("values", a.get("value")),
                dtype=a.get("dtype") or a.get("type"),
            )
        )
    return out


def _join(parent: str, name: str) -> str:
    return f"{parent.rstrip('/')}/{name}" if parent else f"/{name}"


def build_plan(nexus_structure: dict) -> Plan:
    """Walk the tree, mirroring createHDFStructures (HDFOperations.cpp:375-467).

    Stream bindings keep their parent-group path (ModuleHDFInfo.HDFParentName);
    mdat entries are split out pre-planning (JobCreator.cpp:111-121)."""
    plan = Plan()
    _walk_children(nexus_structure.get("children", []), "", plan)
    _expand_extra_modules(plan)
    return plan


def _expand_extra_modules(plan: Plan) -> None:
    extras: list[StreamBinding] = []
    for s in plan.streams:
        for flag_name, module_id in EXTRA_MODULES.get(s.module, ()):
            if s.config.get(f"enable_{flag_name}", True):
                extras.append(
                    StreamBinding(
                        path=s.path,
                        module=module_id,
                        topic=s.topic,
                        source=s.source,
                        config={k: v for k, v in s.config.items() if k in ("topic", "source")},
                    )
                )
    plan.streams.extend(extras)


def _walk_children(children: list, parent: str, plan: Plan) -> None:
    for node in children:
        if not isinstance(node, dict):
            continue
        if node.get("type") == "group" or ("name" in node and "module" not in node):
            name = node.get("name")
            if not name:
                # reject-with-reason like unknown modules (runner.run_job),
                # not a KeyError from deep inside the walk
                raise ValueError(
                    f"nexus_structure group node under {parent or '/'!r} "
                    "has no 'name'"
                )
            path = _join(parent, name)
            plan.groups.append(path)
            plan.group_attributes.extend(_parse_attributes(node, path))
            _walk_children(node.get("children", []), path, plan)
        elif "module" in node:
            _handle_module(node, parent, plan)


def _handle_module(node: dict, parent: str, plan: Plan) -> None:
    module = node["module"]
    config = dict(node.get("config", {}))
    if module == "dataset":
        name = config["name"]
        path = _join(parent, name)
        values = config.get("values")
        plan.static_datasets.append(
            StaticDataset(
                path=path,
                values=values,
                dtype=config.get("dtype") or config.get("type"),
                shape=infer_shape(values),
                attributes=_parse_attributes(node, path),
            )
        )
    elif module == "link":
        plan.links.append(Link(path=_join(parent, config["name"]), target=config["source"]))
    elif module == "mdat":
        plan.mdat.append(MdatBinding(path=parent or "/", items=list(config.get("items", []))))
    else:
        # normalize the documented "type" alias into "dtype" ONCE at parse
        # time (commands.md dtype|type) so every module transform and the
        # pack step read a single key; then canonicalize the VALUE the way
        # the reference does (ToLower + the C-ish alias names,
        # f144_Writer.cpp:58-71): "FLOAT"/"float"→float32,
        # "DOUBLE"/"double"→float64, short→int16, int→int32, long→int64.
        # Unknown names fall through unchanged — downstream falls back to
        # double like the reference's out_of_range handler.
        # (config is already a private copy — dict(node.get("config", {})))
        if "dtype" not in config and "type" in config:
            config["dtype"] = config["type"]
        if isinstance(config.get("dtype"), str):
            low = config["dtype"].lower()
            config["dtype"] = _DTYPE_ALIASES.get(low, low)
        # the reference throws when a stream binding omits topic or source
        # (JobCreatorTests: IfTopicNotDefinedThenThrows /
        # IfSourceNotDefinedThenThrows) — a silent "" would make the
        # binding unmatchable and its datasets permanently empty
        for required in ("topic", "source"):
            if not config.get(required):
                raise ValueError(
                    f"stream module {module!r} under {parent or '/'!r} "
                    f"has no {required!r} in config"
                )
        if module == "da00":
            # the reference throws on a da00 variable/constant without a
            # name (da00 VariableConfig tests: VariableWithoutNameThrows /
            # ConstantWithoutNameThrows) — reject at plan time like the
            # other validations, not deep inside the transform
            for kind in ("variables", "constants"):
                for v in config.get(kind) or []:
                    if isinstance(v, dict) and not v.get("name"):
                        raise ValueError(
                            f"da00 {kind[:-1]} without a name in config "
                            f"under {parent or '/'!r}"
                        )
        plan.streams.append(
            StreamBinding(
                path=parent or "/",
                module=module,
                topic=config.get("topic", ""),
                source=config.get("source", ""),
                config=config,
                attributes=_parse_attributes(node, parent or "/"),
            )
        )
