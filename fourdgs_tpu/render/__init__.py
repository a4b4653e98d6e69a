from fourdgs_tpu.render.render import render
