from vlsfr_tpu.utils.metrics import MetricsLogger, Throughput
