// Independent audio ENCODER: takes "rate channels n\n" + n*channels
// little-endian int16 frames on stdin and writes a WAV, AIFF, or AU
// file through javax.sound.sampled -- byte streams produced entirely
// outside this repository, for exercising _decode_wav / _decode_aiff /
// _decode_au against a second implementation's output (AIFF and AU are
// written big-endian PCM by the JDK, WAV little-endian, exactly the
// layouts the stdlib readers must handle).
//
//   usage: SoundMake <wav|aiff|au> <outfile> [ulaw|alaw|pcm24]
//
// With "ulaw"/"alaw" the JDK CONVERTS the PCM16 input through its own
// G.711 compressor before writing (WAV format code 7/6, AU encoding
// 1/27) -- letting pytest exercise the stdlib G.711 expansion tables
// against companded bytes the JDK produced.  With "pcm24" stdin
// carries 3-byte little-endian frames instead of int16 and the JDK
// writes 24-bit PCM (WAV little-endian, AIFF/AU big-endian).
import javax.sound.sampled.*;
import java.io.BufferedInputStream;
import java.io.ByteArrayInputStream;
import java.io.DataInputStream;
import java.io.File;
import java.io.InputStream;

public class SoundMake {
  public static void main(String[] args) throws Exception {
    InputStream in = new BufferedInputStream(System.in, 1 << 16);
    StringBuilder hdr = new StringBuilder();
    int c;
    while ((c = in.read()) != -1 && c != '\n') hdr.append((char) c);
    String[] parts = hdr.toString().trim().split(" ");
    int rate = Integer.parseInt(parts[0]), ch = Integer.parseInt(parts[1]);
    long n = Long.parseLong(parts[2]);
    boolean wav = args[0].equals("wav");
    int unit = (args.length > 2 && args[2].equals("pcm24")) ? 3 : 2;
    byte[] raw = new byte[(int) (n * ch * unit)];
    new DataInputStream(in).readFully(raw);
    // AIFF/AU are big-endian formats; swap the sample payload.
    if (!wav) {
      if (unit == 2)
        for (int i = 0; i < raw.length; i += 2) {
          byte t = raw[i]; raw[i] = raw[i + 1]; raw[i + 1] = t;
        }
      else
        for (int i = 0; i < raw.length; i += 3) {
          byte t = raw[i]; raw[i] = raw[i + 2]; raw[i + 2] = t;
        }
    }
    AudioFormat fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        rate, 8 * unit, ch, ch * unit, rate, !wav);
    AudioInputStream stream = new AudioInputStream(
        new ByteArrayInputStream(raw), fmt, n);
    if (args.length > 2 && !args[2].equals("pcm24")) {
      AudioFormat.Encoding enc = args[2].equals("ulaw")
          ? AudioFormat.Encoding.ULAW : AudioFormat.Encoding.ALAW;
      stream = AudioSystem.getAudioInputStream(
          new AudioFormat(enc, rate, 8, ch, ch, rate, false), stream);
    }
    AudioFileFormat.Type type =
        wav ? AudioFileFormat.Type.WAVE
            : args[0].equals("aiff") ? AudioFileFormat.Type.AIFF
                                     : AudioFileFormat.Type.AU;
    AudioSystem.write(stream, type, new File(args[1]));
  }
}
