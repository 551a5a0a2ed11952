"""Source connectors: vector-tile label source and imagery readers.

Network + decode libraries (requests / mapbox_vector_tile / PIL / rio-tiler)
may be absent; every connector degrades to an injectable fetcher so tests
and offline runs stay hermetic (the deterministic fakes in ``fake.py``).
"""

from label_maker_dask_spark.sources.vector_tiles import fetch_features
from label_maker_dask_spark.sources.imagery import fetch_images, sniff_imagery

__all__ = ["fetch_features", "fetch_images", "sniff_imagery"]
