from flye_tpu.parallel.mesh import (make_mesh, posting_exchange_step,
                                    sharded_pipeline_step)
