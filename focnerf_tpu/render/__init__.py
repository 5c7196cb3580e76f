from focnerf_tpu.render.renderer import render_rays, render_image
