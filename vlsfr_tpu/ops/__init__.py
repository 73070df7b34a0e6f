from vlsfr_tpu.ops.margin import add_margin, default_hard_neg, margin_logits
