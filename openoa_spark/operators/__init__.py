"""DataFrame-level operators: time-series resampling and hygiene,
flagging filters, imputation, power-curve, plant geometry."""
