from .compiler import (  # noqa: F401
    CompiledQuery,
    DataSetFiltering,
    OrGroup,
    RangeFilter,
    TermsFilter,
    compile_query,
)
