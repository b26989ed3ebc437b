"""kafka_to_nexus_spark — a PySpark-native analytics/ingestion engine with the
query and data-processing capabilities of ess-dmsc/kafka-to-nexus.

The reference (C++17, thread-per-partition) consumes FlatBuffers telemetry
from Kafka and materializes NeXus-structured HDF5. This package re-expresses
that capability surface Spark-first:

- plan/        job ("query") model: StartMessage + nexus_structure walk
- sources/     message-envelope DataFrames (fixtures, Kafka batch+stream)
- operators/   filter/route plane (source filter, time window, as-of
               buffering, dedup, out-of-order/offset-gap detection) plus
               custom joins (stream-to-stream as-of join, bucketed range
               join)
- modules/     the 10 writer modules as DataFrame transforms
               (f144 ev44 se00 ad00 da00 al00 ep01 tdct mdat template)
- sinks/       parquet-staging sink (primary) + gated h5py NeXus sink
- streaming/   Structured Streaming runner (readStream kafka → foreachBatch)
- control/     command plane (pl72 start / 6s4t stop, job FSM, status)
- llm/         scale extras: dedup (exact/minhash/simhash), ANN similarity,
               text analysis, multimodal column plumbing

Everything is DataFrame/SQL-first: Catalyst handles pushdown/pruning; custom
semantics (as-of buffering, cumulative event index) are compositions of
built-in operators, never row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
