# trainer config: 2M model (ref:experiment_setup/config-2M.py values)
model = "2M"
batch_size = 4096
max_iters = 30000
grad_accum = 16
