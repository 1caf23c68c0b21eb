// Independent audio decode oracle: reads WAV / AIFF / AU through
// javax.sound.sampled (the JDK's own parsers, no lineage shared with
// meza_spark/llm/multimodal.py), converts to PCM_SIGNED 16-bit
// little-endian, and dumps:
//
//   stdout: "rate channels n\n" then n*channels little-endian int16
//           frames (interleaved).
//
// The conversion path handles u-law/A-law and 8-bit unsigned inputs,
// so the Python side compares decoded SAMPLE VALUES, not containers.
import javax.sound.sampled.*;
import java.io.BufferedOutputStream;
import java.io.ByteArrayOutputStream;
import java.io.File;
import java.io.OutputStream;

public class SoundDump {
  public static void main(String[] args) throws Exception {
    AudioInputStream in = AudioSystem.getAudioInputStream(new File(args[0]));
    AudioFormat src = in.getFormat();
    AudioFormat dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate(), 16, src.getChannels(),
        src.getChannels() * 2, src.getSampleRate(), false);
    AudioInputStream pcm = AudioSystem.getAudioInputStream(dst, in);
    ByteArrayOutputStream buf = new ByteArrayOutputStream();
    byte[] chunk = new byte[1 << 16];
    int k;
    while ((k = pcm.read(chunk)) > 0) buf.write(chunk, 0, k);
    byte[] data = buf.toByteArray();
    long frames = data.length / (src.getChannels() * 2L);
    OutputStream out = new BufferedOutputStream(System.out, 1 << 16);
    out.write(((int) src.getSampleRate() + " " + src.getChannels() + " "
               + frames + "\n").getBytes("ASCII"));
    out.write(data);
    out.flush();
  }
}
