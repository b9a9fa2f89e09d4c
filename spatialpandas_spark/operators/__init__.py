from spatialpandas_spark.operators.cx import cx_filter, with_bounds
from spatialpandas_spark.operators.sjoin import sjoin
from spatialpandas_spark.operators.pack import pack_partitions

__all__ = ["cx_filter", "with_bounds", "sjoin", "pack_partitions"]
