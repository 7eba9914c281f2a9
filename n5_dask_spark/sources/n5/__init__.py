from n5_dask_spark.sources.n5.codec import decode_block, encode_block
from n5_dask_spark.sources.n5.metadata import DatasetAttributes, read_attributes, write_attributes

__all__ = [
    "decode_block",
    "encode_block",
    "DatasetAttributes",
    "read_attributes",
    "write_attributes",
]
