from zigma_tpu.evals.lm_harness import (  # noqa: F401
    MambaEvalLM,
    loglikelihood_batch,
    loglikelihood_rolling,
)
