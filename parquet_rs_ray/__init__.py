"""Ray-Data-native per-column lightweight-compression engine.

Public API (see README for usage):

    from parquet_rs_ray import (roundtrip, encode_dataset, decode_dataset,
                                encode_job, decode_job, CodecSelector)

Never calls ray.init(); the host application (or the test fixture / CLI)
owns the Ray session.
"""

__version__ = "0.1.0"

from .errors import (DecodeError, EncodeError, FormatError,  # noqa: F401
                     NotYetImplemented, ParquetRsRayError)


def __getattr__(name):
    # lazy re-exports: importing the package must stay cheap (the driver
    # imports __ray_entry__ before Ray workers exist)
    if name in ("roundtrip", "encode_dataset", "decode_dataset"):
        from . import pipeline
        return getattr(pipeline, name)
    if name in ("encode_job", "decode_job", "committed_block_files"):
        from . import job
        return getattr(job, name)
    if name == "CodecSelector":
        from .selector import CodecSelector
        return CodecSelector
    if name == "build_global_dictionary":
        from .globaldict import build_global_dictionary
        return build_global_dictionary
    raise AttributeError(name)
