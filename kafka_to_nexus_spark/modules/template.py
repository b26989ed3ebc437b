"""W10 — the example/no-op writer module ("test").

The reference ships a fully documented skeleton writer as the template
for module authors, registered as a REAL module under schema id "test"
(src/WriterModule/template/TemplateWriter.cpp:17-18): it accepts any
message for its source and writes nothing (TemplateWriter.h:128-181 —
init_hdf/write are print-only stubs). The analog here is the same live
no-op: a plan may bind ``{"module": "test"}`` and the job runs with no
datasets staged for that stream — useful, exactly like the reference's,
for exercising the scan/filter/control planes without a sink.

(The template FILE generation the CLI's ``template-maker`` subcommand
does is a different feature — apps/template-maker.cpp, SURVEY §3.3 —
implemented by running the real modules over an empty scan.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# the reference's skeleton accepts anything (parallel-write flag false,
# repeated timestamps irrelevant for a no-op)
ACCEPTS_REPEATED_TIMESTAMPS = True


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    """No datasets: the reference's write() is a logging stub."""
    return {}
