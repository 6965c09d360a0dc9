from bigdatasearchpro_spark.operators.transform import (  # noqa: F401
    key_by,
    lowercase_names,
    stringify_all,
)
from bigdatasearchpro_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_last_write_wins,
)
