from kafka_etl_automation_spark.functions.scalar import (  # noqa: F401
    dec,
    dsum,
    nvl,
)
from kafka_etl_automation_spark.functions.templating import (  # noqa: F401
    render_template,
    run_template,
)
