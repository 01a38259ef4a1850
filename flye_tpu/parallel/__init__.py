from flye_tpu.parallel.mesh import make_mesh, sharded_pipeline_step
