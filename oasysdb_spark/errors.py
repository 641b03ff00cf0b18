"""Error types mirroring the reference's gRPC status codes.

The reference maps validation failures to tonic `Status::invalid_argument`
and missing records to `Status::not_found`
(/root/reference/src/cores/database.rs:189-199, /root/reference/src/cores/storage.rs:33-41).
Reference quirks that *panic* (malformed filter term, unknown metric name —
/root/reference/src/types/filter.rs:129-135, /root/reference/src/types/metric.rs:43-52)
are deliberately converted to InvalidArgumentError here (SURVEY.md §2.6).
"""


class OasysError(Exception):
    """Base class for engine errors."""


class InvalidArgumentError(OasysError, ValueError):
    """Bad input: wrong vector dimension, k == 0, malformed filter, unknown metric."""


class NotFoundError(OasysError, KeyError):
    """Get/Update on a record id that does not exist."""
