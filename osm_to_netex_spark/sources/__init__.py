from . import catalog, documents, osm_xml  # noqa: F401
