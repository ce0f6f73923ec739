from .kmeans import kmeans, pq_learn
from .encode import pq_encode, pq_decode
from .adc import (adc_table, adc_tile_dists, adc_query_topk, query_plain,
                  pad_codes)
from .topk import smallest_k

__all__ = [
    "kmeans", "pq_learn", "pq_encode", "pq_decode",
    "adc_table", "adc_tile_dists", "adc_query_topk", "query_plain",
    "pad_codes", "smallest_k",
]
