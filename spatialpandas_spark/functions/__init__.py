from spatialpandas_spark.functions.constructors import (
    st_point,
    st_make_box,
    st_make_diamond,
    point_bounds,
)
from spatialpandas_spark.functions.measures import (
    st_area,
    st_length,
    st_bounds,
    total_bounds_aggs,
)
from spatialpandas_spark.functions.predicates import (
    bbox_intersects_bounds,
    st_intersects_bounds,
    st_point_in_polygon,
)
from spatialpandas_spark.functions.hilbert import hilbert_distance_udf

__all__ = [
    "st_point",
    "st_make_box",
    "st_make_diamond",
    "point_bounds",
    "st_area",
    "st_length",
    "st_bounds",
    "total_bounds_aggs",
    "bbox_intersects_bounds",
    "st_intersects_bounds",
    "st_point_in_polygon",
    "hilbert_distance_udf",
]
