"""Sources & sinks: object-store catalogs, convention files, JSON results."""
