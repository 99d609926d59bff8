"""Sources & sinks: schema'd parquet/csv/json IO plus the JDBC transport
(the reference's native boundary), behind small composable helpers."""
