package graft.core

/** Raised when an existing parquet file's schema does not exactly equal the
  * incoming stream schema (strict schema gate — no merge, no evolution).
  * Mirrors the reference's `SchemaChangedError`
  * (reference: target_hdfs/utils/hdfs.py:17-19, 111-116).
  */
class SchemaChangedException(msg: String) extends RuntimeException(msg)

/** Raised when more than one local output file exists while an HDFS
  * append-target is loaded — the compaction rewrite path requires exactly one
  * file (reference: target_hdfs/sinks.py:17-18, 50-54).
  */
class CanNotUploadFileException(msg: String) extends RuntimeException(msg)

/** Raised for malformed configuration values (e.g. a size string without a
  * unit — reference: target_hdfs/utils/__init__.py:19-20). */
class InvalidConfigException(msg: String) extends IllegalArgumentException(msg)

/** Raised when a RECORD violates its stream's declared JSON-Schema
  * constraints: a `required` property is absent from the record, or a
  * `key_properties` column is NULL. Mirrors the singer-sdk record
  * validation the reference inherits (exercised by its standard suite,
  * reference: tests/test_core.py:26-33). */
class RecordValidationException(msg: String) extends RuntimeException(msg)
