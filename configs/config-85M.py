# trainer config: 85M model (ref:experiment_setup/config-85M.py values)
model = "85M"
batch_size = 512
max_iters = 400000
grad_accum = 16
