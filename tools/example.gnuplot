# Plot recipe for the standard debug probe set (see DIAGNOSTICS.md).
# Generate the .dat files first:
#     python tools/dump_diagnostics.py --synth 4
# then run from the repo root:
#     gnuplot -p tools/example.gnuplot
#
# Role parity with the reference's src/example.gnuplot: one multiplot of
# the probes that tell you at a glance whether the chain is healthy.

reset
set grid xtics ytics
set grid lt 1 lc rgb '#cccccc' lw 1
set multiplot layout 2,2 title 'rtsdr\_tpu diagnostics'

# FM-demodulated multiplex PSD: expect the mono spectrum below 15 kHz, the
# 19 kHz pilot spike, DSB-SC stereo around 38 kHz, RDS around 57 kHz.
set title 'demodulated multiplex PSD (IF rate)'
set xlabel 'Frequency (Hz)'
set ylabel 'PSD (dB/Hz)'
set autoscale
plot 'data/demod_psd.dat' using 1:2 with lines lw 2 lc rgb '#880000' notitle

# Decoded mono audio PSD: program material only; pilot/stereo/RDS leakage
# here means the audio LPF or the PLL is wrong.
set title 'mono audio PSD (48 kS/s)'
set xlabel 'Frequency (Hz)'
set ylabel 'PSD (dB/Hz)'
plot 'data/audio_psd.dat' using 1:2 with lines lw 2 lc rgb '#880088' notitle

# RRC matched-filter output: clean bipolar eye every 24 samples when the
# RDS carrier is locked and timing is right.
set title 'RRC output (I, first 512 samples)'
set xlabel 'Sample #'
set ylabel 'Amplitude'
plot 'data/rrc.dat' using 1:2 with lines lw 2 lc rgb '#000088' notitle

# RDS constellation: two tight clusters on the I axis when phase_adjust is
# tuned (tools/constellation.py computes the correction analytically).
set title 'RDS constellation'
set xlabel 'I'
set ylabel 'Q'
set size square
plot 'data/constellation.dat' using 1:2 with points pt 7 ps 0.4 lc rgb '#000088' notitle

unset multiplot
